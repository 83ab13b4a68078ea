"""Multi-chip scaling: device mesh + sharded simulation step.

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
                          pad_back: int):
    """Full sharded simulation step: charge chain + light chain per
    (module, event) mesh cell.

    Layout matches make_sharded_charge_step for the charge inputs; the
    light LUT arrays carry a leading module axis sharded over 'modules'
    (per-module LUTs are the mod2mod light variation), and light params
    are replicated traced leaves.  Per cell: charge_step, then
    visibility -> scintillation/Poisson/SiPM -> beam-trigger digitization
    (light_sim.py pipeline, fixed trigger at tick 0, noise off).

    Returns a jitted function
        (segs, det_stack, response, vis, t0, time_dist, t0_avg, keys)
        -> (adc, waveforms, n_hits_total).
    """
    from ..models import light as light_model
    from ..ops import light as light_ops

    op_channel = jnp.asarray(op_channel)
    light = light_params

    step = functools.partial(
        charge_model.charge_step,
        max_active=max_active, radius=radius, max_nb=max_nb, t_sig=t_sig,
        n_steps=n_steps, n_unique_cap=n_unique_cap, max_adc=max_adc,
        max_tracks=max_tracks)

    def per_shard(segs: Segments, det: DetectorParams, resp,
                  vis, t0, time_dist, t0_avg, key):
        segs = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), segs)
        det = jax.tree.map(lambda x: x[0], det)
        vis, t0 = vis[0], t0[0]
        time_dist, t0_avg = time_dist[0], t0_avg[0]
        ks = jax.random.split(key.reshape(2), 2)
        k_charge, k_light = ks[0], ks[1]
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
        signal = jnp.pad(response_sig, ((0, 0), (pad_front, pad_back)))
        wv = light_ops.digitize_signal(
            signal, jnp.asarray([pad_front]), light,
            digit_samples=digit_samples)

        hits = (fee_res.n_adc > 0).sum()
        n_hits_total = jax.lax.psum(jax.lax.psum(hits, 'events'), 'modules')
        return adc[None, None], wv[None, None], n_hits_total

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P('modules', 'events'), P('modules'), P(),
                  P('modules'), P('modules'), P('modules'), P('modules'),
                  P('modules', 'events')),
        out_specs=(P('modules', 'events'), P('modules', 'events'), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


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
