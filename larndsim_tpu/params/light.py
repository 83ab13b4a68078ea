"""Light-readout parameters as an immutable pytree.

Same YAML surface as the reference loader (consts/light.py:63-170); numeric
gains/efficiencies are leaves, tick sizes and window lengths (which set array
shapes) are static.
"""
from __future__ import annotations

import os
import weakref
from typing import Any

import numpy as np
import yaml
from flax import struct

try:
    _YamlLoader = yaml.CSafeLoader
except AttributeError:
    _YamlLoader = yaml.SafeLoader

#: Default conversion from PE/us to ADC (consts/light.py:35)
DEFAULT_LIGHT_GAIN = -2.30


@struct.dataclass
class LightParams:
    """Device-facing light-simulation constants."""

    # leaves
    op_channel_efficiency: Any     # (n_op_channel,)
    op_channel_to_tpc: Any         # (n_op_channel,) int32
    tpc_to_op_channel: Any         # (n_tpc, n_per_tpc) int32
    light_gain: Any                # (n_op_channel,) ADC*us/PE
    light_trig_threshold: Any      # (n_op_channel/op_channel_per_trig,) ADC
    singlet_fraction: Any
    tau_s: Any                     # us
    tau_t: Any                     # us
    light_response_time: Any       # us (RLC model)
    light_oscillation_period: Any  # us (RLC model)
    impulse_model: Any             # (n_impulse,) measured SiPM impulse
    # statics
    light_simulated: bool = struct.field(pytree_node=False, default=True)
    enable_lut_smearing: bool = struct.field(pytree_node=False, default=False)
    n_op_channel: int = struct.field(pytree_node=False, default=0)
    scint_prescale: float = struct.field(pytree_node=False, default=1.0)
    w_ph: float = struct.field(pytree_node=False, default=19.5e-6)  # MeV
    light_tick_size: float = struct.field(pytree_node=False, default=0.001)  # us
    light_window: tuple[float, float] = struct.field(pytree_node=False, default=(1.0, 10.0))
    sipm_response_model: int = struct.field(pytree_node=False, default=0)
    light_det_noise_sample_spacing: float = struct.field(pytree_node=False, default=0.01)
    impulse_tick_size: float = struct.field(pytree_node=False, default=0.001)
    op_channel_per_trig: int = struct.field(pytree_node=False, default=6)
    light_trig_mode: int = struct.field(pytree_node=False, default=0)
    light_trig_window: tuple[float, float] = struct.field(pytree_node=False, default=(0.9, 1.66))
    light_digit_sample_spacing: float = struct.field(pytree_node=False, default=0.01)
    light_nbit: int = struct.field(pytree_node=False, default=10)


def load_light(detprop_file: str, asset_root: str | None = None) -> LightParams:
    """Build :class:`LightParams` from a detector-properties YAML.

    Falls back to ``light_simulated=False`` if the light keys are absent,
    matching the reference (consts/light.py:167-170).
    """
    import jax.numpy as jnp

    with open(detprop_file) as df:
        detprop = yaml.load(df, Loader=_YamlLoader)

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    i32 = lambda x: jnp.asarray(x, jnp.int32)

    try:
        n_op_channel = int(detprop['n_op_channel'])
        eff = np.array(detprop.get('op_channel_efficiency', np.ones(n_op_channel)))
        if eff.size == 1:
            eff = np.full(n_op_channel, float(eff))

        tpc_to_op = np.array(detprop['tpc_to_op_channel'], dtype=np.int32)
        op_to_tpc = np.zeros(n_op_channel, np.int32)
        for itpc, chans in enumerate(tpc_to_op):
            op_to_tpc[chans] = itpc

        light_gain = np.array(detprop.get('light_gain', [DEFAULT_LIGHT_GAIN]),
                              dtype=np.float64)
        if light_gain.size == 1:
            light_gain = np.full(n_op_channel, float(light_gain))

        sipm_model = int(detprop.get('sipm_response_model', 0))
        impulse = np.array([1.0, 0.0])
        impulse_file = str(detprop.get('impulse_model', ''))
        if impulse_file and sipm_model == 1:
            candidates = [impulse_file]
            if asset_root:
                candidates.append(os.path.join(asset_root, impulse_file))
                candidates.append(os.path.join(asset_root, os.path.basename(impulse_file)))
            for cand in candidates:
                if os.path.isfile(cand):
                    impulse = np.load(cand)
                    break
            else:
                sipm_model = 0

        op_per_trig = int(detprop.get('op_channel_per_det', 6))
        thr = detprop['light_trig_threshold']
        if isinstance(thr, (int, float)):
            thr = np.full(n_op_channel // op_per_trig, float(thr))
        else:
            thr = np.array(thr, dtype=float)

        lp = LightParams(
            op_channel_efficiency=f32(eff),
            op_channel_to_tpc=i32(op_to_tpc),
            tpc_to_op_channel=i32(tpc_to_op),
            light_gain=f32(light_gain),
            light_trig_threshold=f32(thr),
            singlet_fraction=f32(detprop.get('singlet_fraction', 0.3)),
            tau_s=f32(detprop.get('tau_s', 0.001)),
            tau_t=f32(detprop.get('tau_t', 1.530)),
            light_response_time=f32(detprop.get('light_response_time', 0.055)),
            light_oscillation_period=f32(detprop.get('light_oscillation_period', 0.095)),
            impulse_model=f32(impulse),
            light_simulated=bool(detprop.get('light_simulated', True)),
            enable_lut_smearing=bool(detprop.get('enable_lut_smearing', False)),
            n_op_channel=n_op_channel,
            light_tick_size=float(detprop.get('light_tick_size', 0.001)),
            light_window=tuple(detprop.get('light_window', (1.0, 10.0))),
            sipm_response_model=sipm_model,
            light_det_noise_sample_spacing=float(
                detprop.get('light_det_noise_sample_spacing', 0.01)),
            impulse_tick_size=float(detprop.get('impulse_tick_size', 0.001)),
            op_channel_per_trig=op_per_trig,
            light_trig_mode=int(detprop.get('light_trig_mode', 0)),
            light_trig_window=tuple(detprop.get('light_trig_window', (0.9, 1.66))),
            light_digit_sample_spacing=float(
                detprop.get('light_digit_sample_spacing', 0.01)),
            light_nbit=int(detprop.get('light_nbit', 10)),
        )
        # seed the host-scalar cache from the raw YAML values: host code
        # (kernel builders, exporters) must never have to pull these five
        # scalars back through the device — a fresh pull costs a remote
        # compile + tunnel round trip (measured minutes on a bad tunnel)
        seed_host_scalars(lp, {
            'tau_s': float(detprop.get('tau_s', 0.001)),
            'tau_t': float(detprop.get('tau_t', 1.530)),
            'singlet_fraction': float(detprop.get('singlet_fraction', 0.3)),
            'light_response_time': float(
                detprop.get('light_response_time', 0.055)),
            'light_oscillation_period': float(
                detprop.get('light_oscillation_period', 0.095)),
            'impulse_model': np.asarray(impulse, np.float32),
        })
        return lp
    except KeyError:
        return LightParams(
            op_channel_efficiency=f32(np.ones(0)),
            op_channel_to_tpc=i32(np.zeros(0)),
            tpc_to_op_channel=i32(np.zeros((0, 0))),
            light_gain=f32(np.zeros(0)),
            light_trig_threshold=f32(np.zeros(0)),
            singlet_fraction=f32(0.3), tau_s=f32(0.001), tau_t=f32(1.530),
            light_response_time=f32(0.055), light_oscillation_period=f32(0.095),
            impulse_model=f32(np.array([1.0, 0.0])),
            light_simulated=False,
            light_trig_mode=int(detprop.get('light_trig_mode', 0)),
        )


_HOST_SCALAR_CACHE: dict[int, tuple] = {}

#: device-scalar leaves host code needs (kernel builders, exporters)
_HOST_LEAVES = ('tau_s', 'tau_t', 'singlet_fraction',
                'light_response_time', 'light_oscillation_period')


# shared weakref cache helpers (also used by params.detector)
from ._cache import cache_get as _cache_get, cache_put as _cache_put


def seed_host_scalars(light: 'LightParams', values: dict) -> None:
    """Record host copies for `light`'s device-scalar leaves (loaders seed
    this from the raw YAML so host code never pulls them back through the
    device; `adopt` below propagates to device_put copies)."""
    _cache_put(_HOST_SCALAR_CACHE, light, values)


def adopt_host_scalars(new: 'LightParams', old: 'LightParams') -> None:
    """Share `old`'s host-scalar snapshot with `new` (a device_put or
    dataclasses.replace copy with identical scalar values)."""
    values = _cache_get(_HOST_SCALAR_CACHE, old)
    if values is not None:
        seed_host_scalars(new, values)


def host_scalars(light: 'LightParams') -> dict:
    """Host copies of the device-scalar leaves + the impulse model.

    Loader-seeded (no device traffic) for params built by `load_light`;
    falls back to ONE stacked device->host pull for params constructed
    directly (tests) — per-leaf float() costs a tunnel round trip each
    on remote-dispatch TPU hosts (a fresh pull measured minutes on a
    degraded tunnel)."""
    values = _cache_get(_HOST_SCALAR_CACHE, light)
    if values is not None:
        return values
    import jax.numpy as jnp
    stacked = np.asarray(jnp.stack(
        [jnp.ravel(jnp.asarray(getattr(light, n)))[0] for n in _HOST_LEAVES]))
    got = {n: float(v) for n, v in zip(_HOST_LEAVES, stacked)}
    got['impulse_model'] = np.asarray(light.impulse_model)
    _cache_put(_HOST_SCALAR_CACHE, light, got)
    return got
