"""Multi-chip scaling TESTBED: device mesh + sharded simulation step.

This module validates that the full simulation step shards over a
('modules', 'events') mesh and is NOT the production multi-chip path —
production is the CLI's thread-dispatch (`--n_devices`, one dispatch
thread + chip subset per module/event-group), which keeps per-module
shape freedom (mod2mod variation) and the async host pipeline.  See
MIGRATION.md "Hardware / scaling" for the design decision and the
enumerated semantics deltas of this step vs production.

The reference has no distributed backend (SURVEY §2.6): its only
multi-device notions are the sequential module loop
(cli/simulate_pixels.py:678) and host-side event batching.  Both map onto a
2-D JAX mesh:

* ``modules`` axis: LAr modules are light-tight and electronically
  independent, so their detector params (per-module E field, lifetime,
  thresholds — the mod2mod variation) shard across this axis, and each
  shard simulates its own module — the spatial/model-parallel axis.
* ``events`` axis: spills/events are statistically independent — pure data
  parallelism.

Physics needs no collectives (no cross-module interactions); the only
communication is the diagnostic/trigger reduction (psum over the mesh) and
host gather at HDF5-export time, exactly as planned in SURVEY §5.8.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import charge as charge_model
from ..params.detector import DetectorParams
from ..segments import Segments


def make_mesh(n_devices: int | None = None, n_modules: int = 1,
              devices=None) -> Mesh:
    """Build a ('modules', 'events') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    n_mod = max(d for d in range(1, n_modules + 1) if n % d == 0
                and d <= n_modules)
    arr = np.array(devices).reshape(n_mod, n // n_mod)
    return Mesh(arr, ('modules', 'events'))


def stack_module_params(params_list: list[DetectorParams]) -> DetectorParams:
    """Stack per-module DetectorParams leaves along a new leading axis
    (the mod2mod variation as a sharded parameter pytree)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def make_sharded_charge_step(mesh: Mesh, det_stack: DetectorParams,
                             response, *, max_active: int, radius: int,
                             max_nb: int, t_sig: int, n_steps: int,
                             n_unique_cap: int, max_adc: int,
                             max_tracks: int):
    """Build the jitted multi-chip charge step.

    Input layout: every Segments leaf has shape
    (n_modules_shards, n_event_shards * per_shard_batch, ...) — axis 0
    sharded over 'modules', axis 1 over 'events'.  Detector params are
    sharded over 'modules' (one params row per module shard); the response
    LUT is replicated.

    Returns a function (segs_stacked, keys) -> (adc, uniq, n_hits_total)
    where n_hits_total is psum-reduced over the whole mesh (the only
    collective the physics needs).
    """
    step = functools.partial(
        charge_model.charge_step,
        max_active=max_active, radius=radius, max_nb=max_nb, t_sig=t_sig,
        n_steps=n_steps, n_unique_cap=n_unique_cap, max_adc=max_adc,
        max_tracks=max_tracks)

    def per_shard(segs: Segments, det: DetectorParams, resp, key):
        # drop the sharded leading axes inside the shard
        segs = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), segs)
        det = jax.tree.map(lambda x: x[0], det)
        uniq, n_unique, adc, fee_res, fractions, track_map, overflow = step(
            segs, det, resp, key.reshape(2))
        hits = (fee_res.n_adc > 0).sum()
        n_hits_total = jax.lax.psum(jax.lax.psum(hits, 'events'), 'modules')
        return (adc[None, None], uniq[None, None], fractions[None, None],
                n_hits_total)

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P('modules', 'events'), P('modules'), P(),
                  P('modules', 'events')),
        out_specs=(P('modules', 'events'), P('modules', 'events'),
                   P('modules', 'events'), P()),
        # scan carries inside the physics ops are initialized from
        # constants (replicated), which the static varying-axis checker
        # rejects even though the computation is correct per shard
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_sim_step(mesh: Mesh, light_params, op_channel, *,
                          max_active: int, radius: int, max_nb: int,
                          t_sig: int, n_steps: int, n_unique_cap: int,
                          max_adc: int, max_tracks: int,
                          n_ticks: int, conv_ticks: int,
                          digit_samples: int, pad_front: int,
                          pad_back: int, add_noise: bool = False,
                          k_truth: int = 0, trig_mode: int = 1,
                          max_trig: int = 4, group_threshold=None):
    """Full sharded simulation step: charge chain + light chain per
    (module, event) mesh cell — the production device pipeline as one
    SPMD program.

    Layout matches make_sharded_charge_step for the charge inputs; the
    light LUT arrays carry a leading module axis sharded over 'modules'
    (per-module LUTs are the mod2mod light variation), and light params
    are replicated traced leaves.  Per cell: charge_step, then
    visibility -> scintillation/Poisson/SiPM -> triggering ->
    noise + digitization (light_sim.py:545-619 semantics) -> top-K truth
    contributor selection (the metadata the production host workers
    consume, models/light._host_smeared_truth_sparse).

    Args:
        add_noise: inject FFT-spectrum detector noise (a (C, n_fft) noise
            row table rides as an extra replicated input).
        k_truth: >0 selects per-channel top-K truth contributor metadata
            (ids, photons, t0, voxels) per cell — the exact device-side
            output of the production truth path.
        trig_mode: 1 = beam (one forced trigger at tick 0,
            light_sim.py:444-451); 0 = threshold self-trigger: per-cell
            grouped-sum threshold scan + dead-time walk
            (light_sim.py:394-443) with up to ``max_trig`` triggers
            digitized (invalid slots masked to zero).
        group_threshold: (n_grp,) per-trigger-group thresholds
            (trig_mode 0 only).

    Returns a jitted function
        (segs, det_stack, response, vis, t0, time_dist, t0_avg,
         [noise_rows,] keys)
        -> dict(adc, waveforms, trigger_idx, n_triggers, truth_ids,
                truth_contrib, n_hits_total)
    """
    from ..models import light as light_model
    from ..ops import light as light_ops

    op_channel = jnp.asarray(op_channel)
    light = light_params
    if trig_mode == 0:
        assert group_threshold is not None, \
            'mode-0 needs per-group thresholds'
        group_threshold = jnp.asarray(group_threshold, jnp.float32)
        digit_ticks = int(np.ceil((light.light_trig_window[1]
                                   + light.light_trig_window[0])
                                  / light.light_tick_size))

    step = functools.partial(
        charge_model.charge_step,
        max_active=max_active, radius=radius, max_nb=max_nb, t_sig=t_sig,
        n_steps=n_steps, n_unique_cap=n_unique_cap, max_adc=max_adc,
        max_tracks=max_tracks)

    def per_shard(segs: Segments, det: DetectorParams, resp,
                  vis, t0, time_dist, t0_avg, noise_rows, key):
        segs = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), segs)
        det = jax.tree.map(lambda x: x[0], det)
        vis, t0 = vis[0], t0[0]
        time_dist, t0_avg = time_dist[0], t0_avg[0]
        ks = jax.random.split(key.reshape(2), 3)
        k_charge, k_light, k_noise = ks[0], ks[1], ks[2]
        uniq, n_unique, adc, fee_res, fractions, track_map, overflow = step(
            segs, det, resp, k_charge)

        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det, light, vis, t0, n_channels=op_channel.shape[0])
        gains = light.light_gain[op_channel]
        response_sig = light_model._signal_stage(
            segs, vox, n_det, op_channel, time_dist, t0_avg,
            jnp.float32(0.0), gains, k_light, light,
            n_ticks=n_ticks, conv_ticks=conv_ticks,
            lut_smearing=light.enable_lut_smearing)

        # triggers: forced beam trigger, or the mode-0 threshold scan
        # (grouped-sum compare + dead-time walk, light_sim.py:394-443)
        if trig_mode == 0:
            sample_factor = round(light.light_digit_sample_spacing
                                  / light.light_tick_size)
            above = light_ops.group_above_threshold(
                response_sig, group_threshold,
                per_trig=light.op_channel_per_trig,
                sample_factor=sample_factor)
            module_above = above.any(axis=0, keepdims=True)   # one module
            idx, counts = light_ops.dead_time_trigger_scan(
                module_above, digit_ticks=digit_ticks, max_trig=max_trig)
            trig_idx = idx[0]                                 # (max_trig,)
            n_trig = counts[0]
        else:
            trig_idx = jnp.zeros((max_trig,), jnp.int32) \
                .at[1:].set(-1)                               # beam @ 0
            n_trig = jnp.int32(1)

        signal = jnp.pad(response_sig, ((0, 0), (pad_front, pad_back)))
        if add_noise:
            noise = light_ops.gen_light_detector_noise(
                signal.shape, noise_rows[0], k_noise, light)
            signal = signal + noise
        wv = light_ops.digitize_signal(
            signal, jnp.maximum(trig_idx, 0) + pad_front, light,
            digit_samples=digit_samples)
        wv = wv * (trig_idx >= 0).astype(wv.dtype)[:, None, None]

        if k_truth > 0:
            truth_ids, truth_contrib, truth_t0, truth_vox = \
                light_ops.light_truth_select(segs, vox, n_det,
                                             k_truth=k_truth)
        else:
            truth_ids = jnp.zeros((op_channel.shape[0], 1), jnp.int32) - 1
            truth_contrib = jnp.zeros_like(truth_ids, jnp.float32)

        hits = (fee_res.n_adc > 0).sum()
        n_hits_total = jax.lax.psum(jax.lax.psum(hits, 'events'), 'modules')
        return (adc[None, None], wv[None, None], trig_idx[None, None],
                n_trig[None, None], truth_ids[None, None],
                truth_contrib[None, None], n_hits_total)

    cell = P('modules', 'events')
    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(cell, P('modules'), P(),
                  P('modules'), P('modules'), P('modules'), P('modules'),
                  P('modules'), cell),
        out_specs=(cell, cell, cell, cell, cell, cell, P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run(segs, det_stack, response, vis, t0, time_dist, t0_avg, keys,
            noise_rows=None):
        if noise_rows is None:
            n_mod = mesh.shape['modules']
            noise_rows = jnp.ones((n_mod, op_channel.shape[0], 8),
                                  jnp.float32)
        out = jitted(segs, det_stack, response, vis, t0, time_dist,
                     t0_avg, noise_rows, keys)
        return dict(adc=out[0], waveforms=out[1], trigger_idx=out[2],
                    n_triggers=out[3], truth_ids=out[4],
                    truth_contrib=out[5], n_hits_total=out[6])

    return run


def shard_segments(segs_np_list, mesh: Mesh, pad_to: int) -> Segments:
    """Stack per-(module, event-shard) structured arrays into a sharded
    Segments pytree laid out for :func:`make_sharded_charge_step`."""
    from ..segments import from_structured
    n_mod = mesh.shape['modules']
    n_ev = mesh.shape['events']
    assert len(segs_np_list) == n_mod * n_ev
    parts = [from_structured(s, pad_to=pad_to) for s in segs_np_list]
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape(n_mod, n_ev * pad_to),
        *parts)
    sharding = NamedSharding(mesh, P('modules', 'events'))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)
