"""Light readout: LUT visibility, waveform synthesis, triggering, digitization.

Reference semantics: lightLUT.py (visibility lookup) and light_sim.py
(scintillation, PE statistics, SiPM response, noise, triggers, digitizer).

TPU-first redesign (SURVEY §2.6 P5):

* per-(det, tick) loops over contributing tracks (sum_light_signals,
  light_sim.py:58-129) become scatter-adds over (segment, channel) pairs;
* the causal scintillation and SiPM convolutions (per-tick O(window) loops,
  light_sim.py:148-183, :303-336) become FFT convolutions with the same
  truncated kernels;
* Poisson fluctuations use the same hybrid sampler (exact Poisson below
  mean 30, truncated gaussian above, light_sim.py:186-238) via jax.random.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params.detector import DEFAULT_PLANE_INDEX, DetectorParams
from ..params.light import LightParams
from ..segments import Segments


# --------------------------------------------------------------------------
# Light LUT container
# --------------------------------------------------------------------------

class LightLUT:
    """Device arrays unpacked from a light lookup-table npz.

    The on-disk format is a structured array 'arr' of shape
    (nx, ny, nz, ndet_tpc) with fields vis / t0 / t0_avg / time_dist
    (cli/simulate_pixels.py:768-787).
    """

    _UPLOAD_CACHE: dict = {}

    def __init__(self, vis, t0, t0_avg, time_dist,
                 time_dist_host=None, t0_avg_host=None):
        self.vis = vis
        self.t0 = t0
        self.t0_avg = t0_avg
        self.time_dist = time_dist
        # host copies back the worker-thread truth recompute (the smeared
        # truth chain runs on host from tiny per-contributor metadata
        # instead of pulling dense truth tensors off the device)
        self.time_dist_host = (time_dist_host if time_dist_host is not None
                               else np.asarray(time_dist))
        self.t0_avg_host = (t0_avg_host if t0_avg_host is not None
                            else np.asarray(t0_avg))

    @property
    def vox_div(self):
        return self.vis.shape[:3]

    @classmethod
    def from_structured(cls, arr: np.ndarray) -> 'LightLUT':
        # cache the device upload per source array (a 2x2-sized LUT is
        # ~230 MB host-side; repeated runs/modules reuse one LightLUT)
        key = (id(arr), arr.__array_interface__['data'][0], arr.shape)
        hit = cls._UPLOAD_CACHE.get(key)
        if hit is not None and hit[0] is arr:
            return hit[1]
        out = cls._from_structured_uncached(arr)
        if len(cls._UPLOAD_CACHE) > 4:
            cls._UPLOAD_CACHE.clear()
        cls._UPLOAD_CACHE[key] = (arr, out)
        return out

    @classmethod
    def _from_structured_uncached(cls, arr: np.ndarray) -> 'LightLUT':
        # clip zero-visibility voxels to the minimum positive visibility
        # (cli/simulate_pixels.py:780-782)
        vis = np.array(arr['vis'], np.float32)
        mask = vis > 0
        if mask.any():
            vis[~mask] = vis[mask].min()
        names = arr.dtype.names
        t0 = np.array(arr['t0'], np.float32) if 't0' in names else \
            np.zeros(vis.shape, np.float32)
        t0_avg = np.array(arr['t0_avg'], np.float32) if 't0_avg' in names else \
            np.zeros(vis.shape, np.float32)
        tdist = np.array(arr['time_dist'], np.float32) if 'time_dist' in names \
            else np.ones(vis.shape + (1,), np.float32)
        return cls(jnp.asarray(vis), jnp.asarray(t0), jnp.asarray(t0_avg),
                   jnp.asarray(tdist), time_dist_host=tdist,
                   t0_avg_host=t0_avg)

    @classmethod
    def load(cls, path: str) -> 'LightLUT':
        return cls.from_structured(np.load(path)['arr'])

    def to_device(self, device) -> 'LightLUT':
        """Copy of this LUT with its device arrays committed to `device`
        (multi-chip CLI path); host copies are shared."""
        put = lambda x: jax.device_put(x, device)
        return LightLUT(put(self.vis), put(self.t0), put(self.t0_avg),
                        put(self.time_dist),
                        time_dist_host=self.time_dist_host,
                        t0_avg_host=self.t0_avg_host)


# --------------------------------------------------------------------------
# Visibility lookup (lightLUT.py)
# --------------------------------------------------------------------------

def get_voxel(segs: Segments, det: DetectorParams, vox_div):
    """LUT voxel indices per segment (lightLUT.get_voxel, :15-63):
    fractional position in the (tolerance-padded) TPC volume, with x
    mirrored in odd TPCs to preserve left/right-ness."""
    plane = jnp.clip(segs.pixel_plane, 0, det.n_tpcs - 1)
    b = det.tpc_borders[plane]                       # (S, 3, 2)
    is_even = b[:, 2, 1] > b[:, 2, 0]
    pad = 2e-2
    x_min, x_max = b[:, 0, 0] - pad, b[:, 0, 1] + pad
    y_min, y_max = b[:, 1, 0] - pad, b[:, 1, 1] + pad
    z_min, z_max = b[:, 2, 0] - pad, b[:, 2, 1] + pad

    i_even = (segs.x - x_min) / (x_max - x_min) * vox_div[0]
    i_odd = (x_max - segs.x) / (x_max - x_min) * vox_div[0]
    i = jnp.where(is_even, i_even, i_odd).astype(jnp.int32)
    j = ((y_max - segs.y) / (y_max - y_min) * vox_div[1]).astype(jnp.int32)
    k = ((segs.z - z_min) / (z_max - z_min) * vox_div[2]).astype(jnp.int32)
    i = jnp.clip(i, 0, vox_div[0] - 1)
    j = jnp.clip(j, 0, vox_div[1] - 1)
    k = jnp.clip(k, 0, vox_div[2] - 1)
    return jnp.stack([i, j, k], axis=-1)


@functools.partial(jax.jit, static_argnames=('n_channels', 'channel_offset'))
def calculate_light_incidence(segs: Segments, det: DetectorParams,
                              light: LightParams, lut_vis, lut_t0, *,
                              n_channels: int, channel_offset: int = 0):
    """Photons incident on each optical channel (lightLUT.py:65-136).

    Args:
        lut_vis: (nx, ny, nz, ndet_tpc) visibility.
        lut_t0: (nx, ny, nz, ndet_tpc) earliest arrival [ns].
        n_channels: output channel count (per module when mod2mod).
        channel_offset: absolute index of output channel 0 (mod2mod).

    Returns:
        (n_photons_det (S, n_channels), t0_det (S, n_channels), voxel (S, 3))
    """
    vox = get_voxel(segs, det, lut_vis.shape[:3])
    itpc = segs.pixel_plane
    in_tpc = (itpc != DEFAULT_PLANE_INDEX) & segs.valid

    out_i = jnp.arange(n_channels)
    op_abs = out_i + channel_offset                      # absolute channel
    lut_idx = out_i % lut_vis.shape[3]

    vis = lut_vis[vox[:, 0], vox[:, 1], vox[:, 2]][:, lut_idx]   # (S, C)
    t1 = lut_t0[vox[:, 0], vox[:, 1], vox[:, 2]][:, lut_idx]
    eff = light.op_channel_efficiency[op_abs]
    same_tpc = light.op_channel_to_tpc[op_abs][None, :] == itpc[:, None]

    n_det = jnp.where(in_tpc[:, None] & same_tpc,
                      eff[None, :] * vis * segs.n_photons[:, None], 0.0)
    # t0 in us: lut t0 [ns] + segment t0 [us] (lightLUT.py:135)
    t0_det = jnp.where(in_tpc[:, None],
                       t1 * 1e-3 + segs.t0[:, None], 0.0)
    return n_det.astype(jnp.float32), t0_det.astype(jnp.float32), vox


# --------------------------------------------------------------------------
# Waveform synthesis (light_sim.py)
# --------------------------------------------------------------------------

def get_nticks(n_photons_det: np.ndarray, t0_det: np.ndarray,
               light: LightParams):
    """Simulation window sizing (light_sim.get_nticks, :24-41). Host-side."""
    mask = n_photons_det > 0
    if mask.any() and light.light_trig_mode == 0:
        start = float(t0_det[mask].min()) - light.light_window[0]
        end = float(t0_det[mask].max()) + light.light_window[1]
        return int(np.ceil((end - start) / light.light_tick_size)), start
    return int((light.light_window[1] + light.light_window[0])
               / light.light_tick_size), 0.0


@functools.partial(jax.jit, static_argnames=('n_ticks', 'lut_smearing'))
def sum_light_signals(segs: Segments, voxels, n_photons_det, op_channel,
                      lut_time_dist, lut_t0_avg, start_time,
                      light: LightParams, *, n_ticks: int,
                      lut_smearing: bool):
    """Photon arrival time series per channel (light_sim.py:58-129).

    Scatter-add over (segment, channel[, profile-bin]) replacing the
    reference's per-(det, tick) search over sorted segments.

    Args:
        voxels: (S, 3) LUT voxel per segment.
        n_photons_det: (S, C) photons on each simulated channel.
        op_channel: (C,) absolute channel index of each output row.
        lut_time_dist: (nx, ny, nz, ndet_tpc, nprof) normalized profiles.
        lut_t0_avg: (nx, ny, nz, ndet_tpc) mean arrival delay [ns].
        start_time: window start [us].

    Returns:
        (C, n_ticks) photons/us.
    """
    S, C = n_photons_det.shape
    tick = light.light_tick_size
    lut_idx = op_channel % lut_time_dist.shape[3]
    track_time = segs.t0                                       # (S,)

    out = jnp.zeros((C, n_ticks), jnp.float32)
    det_rows = jnp.broadcast_to(jnp.arange(C)[None, :], (S, C))

    if S == 0:
        return out
    if lut_smearing:
        nprof = lut_time_dist.shape[4]
        # The tick index is per-(segment, profile-bin) — CHANNEL-
        # INDEPENDENT — so scatter whole channel rows with a (S*nprof,)
        # index vector instead of broadcasting (S, C, nprof) index
        # tensors (whose iota/select temporaries were 3x 4.7 GB at
        # ndlar-scale occupancy).  Segments are processed in fixed-size
        # chunks under lax.scan so the (chunk, C, nprof) value tensor
        # bounds live memory at any occupancy.
        CH = min(512, S)
        n_chunks = -(-S // CH)
        S_pad = n_chunks * CH
        if S_pad != S:
            # zero-photon padding contributes nothing (vox 0 is a valid
            # LUT cell; its profile is multiplied by 0 photons)
            zpad = lambda x: jnp.concatenate(
                [x, jnp.zeros((S_pad - S,) + x.shape[1:], x.dtype)])
            voxels_p, nd_p, tt_p = (zpad(voxels), zpad(n_photons_det),
                                    zpad(track_time))
        else:
            voxels_p, nd_p, tt_p = voxels, n_photons_det, track_time
        j_arr = jnp.arange(nprof, dtype=jnp.float32)[None, :] * 1e-3

        def chunk_body(acc, xs):
            vox_c, nd_c, tt_c = xs
            prof = lut_time_dist[vox_c[:, 0], vox_c[:, 1],
                                 vox_c[:, 2]][:, lut_idx, :]  # (CH, C, nprof)
            # profile bin iprof arrives at track_time + iprof * 1ns
            # (light_sim.py:101: assumes 1 ns profile bins)
            t_arr = tt_c[:, None] + j_arr                      # (CH, nprof)
            tick_f = (t_arr - start_time) / tick
            itick = jnp.ceil(tick_f).astype(jnp.int32) - 1
            # strict (start_tick_time, end_tick_time) interval as in the
            # reference
            ok = (tick_f > itick) & (itick >= 0) & (itick < n_ticks)
            photons = (nd_c[:, :, None] * prof / tick
                       * ok[:, None, :])                       # (CH, C, nprof)
            upd = photons.transpose(0, 2, 1).reshape(CH * nprof, C)
            idx = jnp.where(ok, itick, n_ticks).reshape(CH * nprof)
            return acc.at[idx].add(upd, mode='drop'), None

        xs = (voxels_p.reshape(n_chunks, CH, 3),
              nd_p.reshape(n_chunks, CH, C),
              tt_p.reshape(n_chunks, CH))
        acc0 = jnp.zeros((n_ticks, C), jnp.float32)
        acc, _ = jax.lax.scan(chunk_body, acc0, xs)
        out = acc.T
    else:
        t0_avg = lut_t0_avg[voxels[:, 0], voxels[:, 1],
                            voxels[:, 2]][:, lut_idx]           # (S, C)
        t_arr = track_time[:, None] + t0_avg * 1e-3             # ns -> us
        tick_f = (t_arr - start_time) / tick
        itick = jnp.ceil(tick_f).astype(jnp.int32) - 1
        ok = (tick_f > itick) & (itick >= 0) & (itick < n_ticks)
        photons = n_photons_det / tick * ok
        out = out.at[det_rows, jnp.where(ok, itick, 0)].add(
            photons, mode='drop')
    return out


@functools.partial(jax.jit, static_argnames=('n_ticks', 'k_truth',
                                             'lut_smearing'))
def light_truth_series(segs: Segments, voxels, n_photons_det, op_channel,
                       lut_time_dist, lut_t0_avg, start_time,
                       light: LightParams, *, n_ticks: int, k_truth: int,
                       lut_smearing: bool):
    """Per-(channel, top-K segment) photon time series for MC truth.

    The reference tracks up to MAX_MC_TRUTH_IDS (segment, photons) pairs per
    (channel, tick) with first-empty-slot searches inside every kernel
    (light_sim.py:106-129, :170-183, :322-336).  The truth chain is linear
    (no Poisson, no gain, no noise: light_sim.py:320 vs :335), so here we
    instead select the K strongest contributing segments per channel and
    propagate their individual series through the same convolutions.

    Returns:
        truth_ids: (C, K) int32 global segment ids (-1 padding).
        series: (C, K, n_ticks) float32 photons/us per contributor.
    """
    S, C = n_photons_det.shape
    k_truth = min(k_truth, S)
    tick = light.light_tick_size
    # top-K segments per channel by detected photons
    order = jnp.argsort(-n_photons_det, axis=0)[:k_truth]       # (K, C)
    contrib = jnp.take_along_axis(n_photons_det, order, axis=0)  # (K, C)
    has = contrib > 0
    truth_ids = jnp.where(has, segs.segment_id[order], -1).T    # (C, K)

    lut_idx = op_channel % lut_time_dist.shape[3]
    track_time = segs.t0[order]                                  # (K, C)
    vox = voxels[order]                                          # (K, C, 3)

    if lut_smearing:
        nprof = lut_time_dist.shape[4]
        prof = lut_time_dist[vox[..., 0], vox[..., 1], vox[..., 2],
                             lut_idx[None, :]]                   # (K, C, nprof)
        t_arr = (track_time[..., None]
                 + jnp.arange(nprof)[None, None, :] * 1e-3)
        tick_f = (t_arr - start_time) / tick
        itick = jnp.ceil(tick_f).astype(jnp.int32) - 1
        ok = (tick_f > itick) & (itick >= 0) & (itick < n_ticks) \
            & has[..., None]
        photons = contrib[..., None] * prof / tick * ok
        out = jnp.zeros((C, k_truth, n_ticks), jnp.float32)
        c_ix = jnp.broadcast_to(jnp.arange(C)[None, :, None], photons.shape)
        k_ix = jnp.broadcast_to(jnp.arange(k_truth)[:, None, None],
                                photons.shape)
        out = out.at[c_ix, k_ix, jnp.where(ok, itick, 0)].add(
            photons, mode='drop')
        return truth_ids, out

    t0_avg = lut_t0_avg[vox[..., 0], vox[..., 1], vox[..., 2],
                        lut_idx[None, :]]                        # (K, C)
    t_arr = track_time + t0_avg * 1e-3
    tick_f = (t_arr - start_time) / tick
    itick = jnp.ceil(tick_f).astype(jnp.int32) - 1
    ok = (tick_f > itick) & (itick >= 0) & (itick < n_ticks) & has
    photons = contrib / tick * ok
    out = jnp.zeros((C, k_truth, n_ticks), jnp.float32)
    c_ix = jnp.broadcast_to(jnp.arange(C)[None, :], (k_truth, C))
    k_ix = jnp.broadcast_to(jnp.arange(k_truth)[:, None], (k_truth, C))
    out = out.at[c_ix, k_ix, jnp.where(ok, itick, 0)].add(
        photons, mode='drop')
    return truth_ids, out


@functools.partial(jax.jit, static_argnames=('k_truth',))
def light_truth_select(segs: Segments, voxels, n_photons_det, *,
                       k_truth: int):
    """Top-K truth contributor metadata per channel (device side of the
    host smeared-truth recompute).

    Same selection as light_truth_series (argsort by detected photons);
    only (C, K)-sized arrays ever leave the device — the host rebuilds the
    profile series from its own LUT copy and pushes it through the linear
    transfer table (models/light._host_smeared_truth).

    Returns:
        ids (C,K) int32, contrib (C,K) f32 photons, t0_sel (C,K) f32,
        vox_sel (C,K,3) int32.
    """
    S, C = n_photons_det.shape
    k_truth = min(k_truth, S)
    order = jnp.argsort(-n_photons_det, axis=0)[:k_truth]       # (K, C)
    contrib = jnp.take_along_axis(n_photons_det, order, axis=0)  # (K, C)
    has = contrib > 0
    ids = jnp.where(has, segs.segment_id[order], -1)            # (K, C)
    t0_sel = segs.t0[order]                                      # (K, C)
    vox_sel = voxels[order]                                      # (K, C, 3)
    return (ids.T.astype(jnp.int32),
            jnp.where(has, contrib, 0.0).T.astype(jnp.float32),
            t0_sel.T.astype(jnp.float32),
            vox_sel.transpose(1, 0, 2).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=('k_truth',))
def light_truth_points(segs: Segments, voxels, n_photons_det, op_channel,
                       lut_t0_avg, start_time, light: LightParams, *,
                       k_truth: int):
    """Top-K truth contributors as (segment id, photons/us, arrival tick).

    Without LUT smearing each contributor's photon series is a single
    delta, so the whole truth chain (two linear convolutions + digitizer
    interpolation) collapses to a closed-form kernel lookup — see
    light_truth_sample.  Returns (ids (C,K), amp (C,K), itick (C,K)).
    """
    S, C = n_photons_det.shape
    k_truth = min(k_truth, S)
    tick = light.light_tick_size
    order = jnp.argsort(-n_photons_det, axis=0)[:k_truth]       # (K, C)
    contrib = jnp.take_along_axis(n_photons_det, order, axis=0)
    has = contrib > 0
    ids = jnp.where(has, segs.segment_id[order], -1).T          # (C, K)

    lut_idx = op_channel % lut_t0_avg.shape[3]
    vox = voxels[order]
    t0_avg = lut_t0_avg[vox[..., 0], vox[..., 1], vox[..., 2],
                        lut_idx[None, :]]
    t_arr = segs.t0[order] + t0_avg * 1e-3
    tick_f = (t_arr - start_time) / tick
    itick = jnp.ceil(tick_f).astype(jnp.int32) - 1              # (K, C)
    amp = jnp.where(has & (tick_f > itick), contrib / tick, 0.0)
    return ids, amp.T.astype(jnp.float32), itick.T


@functools.partial(jax.jit, static_argnames=('digit_samples',))
def light_truth_sample(amp, itick, kernel, trigger_idx,
                       light: LightParams, *, digit_samples: int):
    """Truth waveform samples via direct kernel interpolation.

    truth[trig, c, s, k] = amp[c,k] * kernel(sample_tick(trig,s) - itick),
    linearly interpolated, 0 outside the kernel support — exactly the
    delta-series pushed through the combined convolution + digitizer
    interp, with no (C, K, n_ticks) intermediate.
    """
    f = light.light_digit_sample_spacing / light.light_tick_size
    pre = int(np.ceil(light.light_trig_window[0] / light.light_tick_size))
    sample_tick = (trigger_idx[:, None] - pre
                   + jnp.arange(digit_samples)[None, :] * f)    # (T, S)
    x = (sample_tick[:, None, None, :]
         - itick[None, :, :, None])                             # (T, C, K, S)
    i0 = jnp.floor(x).astype(jnp.int32)
    frac = x - i0
    n = kernel.shape[0]
    v0 = jnp.where((i0 >= 0) & (i0 < n), kernel[jnp.clip(i0, 0, n - 1)], 0.)
    v1 = jnp.where((i0 + 1 >= 0) & (i0 + 1 < n),
                   kernel[jnp.clip(i0 + 1, 0, n - 1)], 0.)
    vals = v0 + (v1 - v0) * frac
    out = amp[None, :, :, None] * vals                          # (T,C,K,S)
    return out.transpose(0, 1, 3, 2)                            # (T,C,S,K)


def scintillation_kernel(light: LightParams, conv_ticks: int) -> jnp.ndarray:
    """Two-exponential emission-time kernel (light_sim.py:132-145).

    conv_ticks + 1 taps: the reference convolution loop spans
    ``range(itick - conv_ticks, itick + 1)`` — t-j in [0, conv_ticks]
    INCLUSIVE (light_sim.py:164)."""
    k = jnp.arange(conv_ticks + 1)
    tick = light.light_tick_size
    p1 = (light.singlet_fraction * jnp.exp(-k * tick / light.tau_s)
          * (1 - jnp.exp(-tick / light.tau_s)))
    p3 = ((1 - light.singlet_fraction) * jnp.exp(-k * tick / light.tau_t)
          * (1 - jnp.exp(-tick / light.tau_t)))
    return p1 + p3


def sipm_kernel(light: LightParams, conv_ticks: int) -> jnp.ndarray:
    """SiPM impulse response kernel (light_sim.py:274-300).

    conv_ticks + 1 taps, matching the reference loop's inclusive bound
    (light_sim.py:318)."""
    k = jnp.arange(conv_ticks + 1)
    tick = light.light_tick_size
    if light.sipm_response_model == 0:
        t = k * tick
        imp = (jnp.exp(-t / light.light_response_time)
               * jnp.sin(t / light.light_oscillation_period))
        imp = imp / (light.light_oscillation_period
                     * light.light_response_time ** 2)
        imp = imp * (light.light_oscillation_period ** 2
                     + light.light_response_time ** 2)
        return imp * tick
    # measured impulse, linearly interpolated to the light tick grid
    idx = k * tick / light.impulse_tick_size
    i0 = jnp.floor(idx).astype(jnp.int32)
    frac = idx - i0
    arr = light.impulse_model
    n = arr.shape[0]
    v0 = jnp.where((i0 >= 0) & (i0 < n), arr[jnp.clip(i0, 0, n - 1)], 0.0)
    v1 = jnp.where((i0 + 1 >= 0) & (i0 + 1 < n),
                   arr[jnp.clip(i0 + 1, 0, n - 1)], 0.0)
    imp = jnp.where(i0 > n - 2, 0.0, v0 + (v1 - v0) * frac)
    return imp / (light.impulse_tick_size / light.light_tick_size)


def causal_convolve(signal: jnp.ndarray, kernel: jnp.ndarray,
                    row_chunk: int | None = None) -> jnp.ndarray:
    """FFT causal convolution, output truncated to the signal length.

    Args:
        row_chunk: process rows in chunks of this size (bounds the complex
            FFT intermediates for very wide inputs, e.g. truth series).
    """
    n = signal.shape[-1]
    k = kernel.shape[-1]
    fft_len = int(2 ** np.ceil(np.log2(max(n + k - 1, 1))))
    ker_f = jnp.fft.rfft(kernel, fft_len)

    def conv(rows):
        sig_f = jnp.fft.rfft(rows, fft_len, axis=-1)
        return jnp.fft.irfft(sig_f * ker_f, fft_len, axis=-1)[..., :n]

    if row_chunk is None or signal.ndim == 1 \
            or signal.shape[0] <= row_chunk:
        return conv(signal)
    rows = signal.shape[0]
    pad = (-rows) % row_chunk
    padded = jnp.pad(signal, ((0, pad), (0, 0)))
    chunks = padded.reshape(-1, row_chunk, n)
    out = jax.lax.map(conv, chunks)
    return out.reshape(-1, n)[:rows]


@functools.partial(jax.jit, static_argnames=('conv_ticks',))
def calc_scintillation_effect(light_sample_inc, light: LightParams, *,
                              conv_ticks: int):
    """LAr scintillation time smearing (light_sim.py:148-168)."""
    return causal_convolve(light_sample_inc,
                           scintillation_kernel(light, conv_ticks))


@functools.partial(jax.jit,
                   static_argnames=('n_ticks', 'digit_samples', 'pad_front',
                                    'n_padded'))
def truth_transfer_table(kernel, trigger_off, light: LightParams, *,
                         n_ticks: int, digit_samples: int, pad_front: int,
                         n_padded: int):
    """Transfer table T collapsing the linear truth chain into one matmul.

    The smeared-truth chain — causal convolution with the combined
    scintillation*SiPM kernel, front/back zero padding, and the digitizer's
    linear interpolation with its boundary rules (light_sim.py:170-183,
    :322-336, :480-543) — is linear in the photon tick series, so

        series (R, n_ticks) @ T (n_ticks, ntrig*digit_samples)

    equals digitize_signal(pad(causal_convolve(series, kernel)),
    padded_trigger_idx, quantize=False) flattened over (trigger, sample).
    One MXU matmul replaces an FFT convolution over every
    (channel, contributor) row.

    Args:
        kernel: combined causal kernel (LK,), zero outside [0, LK).
        trigger_off: (ntrig,) trigger ticks in FLAT (unpadded) coordinates,
            i.e. padded_trigger_idx - pad_front.
        n_padded: padded signal length n_ticks + pad_front + pad_back (for
            the reference's end-of-signal sample rule, light_sim.interp
            :241-271).
    """
    f = light.light_digit_sample_spacing / light.light_tick_size
    pre = int(np.ceil(light.light_trig_window[0] / light.light_tick_size))
    # sample positions in flat coordinates, flattened over (trigger, sample)
    y = (trigger_off[:, None].astype(jnp.float32) - pre
         + jnp.arange(digit_samples, dtype=jnp.float32)[None, :]
         * jnp.float32(f)).reshape(-1)                         # (Q,)
    i0 = jnp.floor(y).astype(jnp.int32)
    frac = (y - i0).astype(kernel.dtype)
    LK = kernel.shape[0]
    j = jnp.arange(n_ticks, dtype=jnp.int32)

    def kval(idx):
        return jnp.where((idx >= 0) & (idx < LK),
                         kernel[jnp.clip(idx, 0, LK - 1)], 0.0)

    # the convolved signal exists on flat ticks [0, n_ticks); the padded
    # signal is zero elsewhere, so out-of-range interpolation ends read 0
    in0 = (i0 >= 0) & (i0 < n_ticks)
    in1 = (i0 + 1 >= 0) & (i0 + 1 < n_ticks)
    # reference edge rule: the sample is zeroed when floor(position) passes
    # the end of the PADDED signal (digitize_signal / light_sim.interp)
    edge = (i0 + pad_front) <= n_padded - 2
    v0 = jnp.where(in0[None, :], kval(i0[None, :] - j[:, None]), 0.0)
    v1 = jnp.where(in1[None, :], kval(i0[None, :] + 1 - j[:, None]), 0.0)
    return jnp.where(edge[None, :], v0 + (v1 - v0) * frac[None, :], 0.0)


@jax.jit
def calc_stat_fluctuations(light_sample_inc, key, light: LightParams):
    """Poisson PE fluctuations per tick (light_sim.py:186-238): exact
    Poisson below mean 30, truncated gaussian above."""
    tick = light.light_tick_size
    mean = light_sample_inc * tick
    k1, k2 = jax.random.split(key)
    small = jax.random.poisson(k1, jnp.maximum(mean, 1e-30)).astype(jnp.float32)
    big = jnp.maximum(
        jnp.floor(jax.random.normal(k2, mean.shape)
                  * jnp.sqrt(jnp.maximum(mean, 0)) + mean), 0.0)
    n = jnp.where(mean < 30, small, big)
    return jnp.where(mean > 0, n / tick, 0.0)


@functools.partial(jax.jit, static_argnames=('conv_ticks',))
def calc_light_detector_response(light_sample_inc, gains,
                                 light: LightParams, *, conv_ticks: int):
    """SiPM response convolution x per-channel gain (light_sim.py:303-336)."""
    resp = causal_convolve(light_sample_inc, sipm_kernel(light, conv_ticks))
    return gains[:, None] * resp


# --------------------------------------------------------------------------
# Noise, triggers, digitizer
# --------------------------------------------------------------------------

def gen_light_detector_noise(shape, light_det_noise, key,
                             light: LightParams):
    """Frequency-domain noise synthesis (light_sim.py:339-377): resample the
    measured amplitude spectrum onto the simulation tick grid, randomize
    phases, inverse FFT."""
    if shape[0] == 0:
        return jnp.zeros(shape)
    noise_freq = jnp.fft.rfftfreq((light_det_noise.shape[-1] - 1) * 2,
                                  d=light.light_det_noise_sample_spacing)
    desired_freq = jnp.fft.rfftfreq(shape[-1], d=light.light_tick_size)
    bin_size = jnp.diff(desired_freq).mean()
    spectrum = jax.vmap(lambda row: jnp.interp(
        desired_freq, noise_freq, row, left=0., right=0.))(light_det_noise)
    spectrum = spectrum * (jnp.sqrt(jnp.diff(noise_freq).mean() / bin_size)
                           * light.light_digit_sample_spacing
                           / light.light_tick_size)
    phase = 2 * jnp.pi * jax.random.uniform(key, spectrum.shape)
    # complex exp is unimplemented on TPU; assemble re/im explicitly
    noise_f = jax.lax.complex(spectrum * jnp.cos(phase),
                              spectrum * jnp.sin(phase))
    if shape[1] < 2:
        noise = jnp.round(jnp.real(noise_f)) * 2 ** (16 - light.light_nbit)
    else:
        noise = (jnp.round(jnp.fft.irfft(noise_f, axis=-1))
                 * 2 ** (16 - light.light_nbit))
    if noise.shape[1] < shape[1]:
        noise = jnp.concatenate(
            [noise, jnp.zeros((noise.shape[0], shape[1] - noise.shape[1]))],
            axis=-1)
    return noise[:, :shape[1]]


@functools.partial(jax.jit, static_argnames=('per_trig', 'sample_factor'))
def group_above_threshold(signal, group_threshold, *, per_trig: int,
                          sample_factor: int):
    """Per-trigger-group threshold comparison at the ADC sample rate
    (light_sim.py:394-409), reduced on device: only the (n_grp, nticks)
    boolean leaves the chip.

    NOTE: the comparison is `<` — the measured thresholds are negative-
    going ADC pulses (light_sim.py:407).
    """
    C, T = signal.shape
    n_grp = C // per_trig
    s = signal.reshape(n_grp, per_trig, T).sum(axis=1)        # (n_grp, T)
    padding = (-T) % sample_factor
    if padding:
        s = jnp.pad(s, ((0, 0), (0, padding)))
    blocks = s.reshape(n_grp, -1, sample_factor).mean(axis=-1)
    s_ds = jnp.repeat(blocks, sample_factor, axis=-1)[:, :T]
    return s_ds < group_threshold[:, None]


@functools.partial(jax.jit, static_argnames=('digit_ticks', 'max_trig'))
def dead_time_trigger_scan(above: jnp.ndarray, *, digit_ticks: int,
                           max_trig: int):
    """Device reformulation of the sequential dead-time trigger walk
    (light_sim.py:430-443): a blocked `lax.scan` over tick blocks.

    With block <= digit_ticks, at most one trigger can fire per block, so
    each scan step reduces a whole block with one masked argmax and the
    sequential carry is a single "next allowed tick" scalar per row —
    T/block iterations instead of the reference's per-tick walk.

    Args:
        above: (M, T) bool, per-module above-threshold flags.
        digit_ticks: dead time after each trigger, in light ticks.
        max_trig: output slots (T // digit_ticks + 1 is an exact bound).

    Returns:
        idx: (M, max_trig) int32 trigger ticks, -1 padded, ascending.
        counts: (M,) int32 triggers per row.
    """
    M, T = above.shape
    block = max(min(256, digit_ticks), 1)
    nb = -(-T // block)
    a = jnp.pad(above, ((0, 0), (0, nb * block - T)))
    a = a.reshape(M, nb, block).transpose(1, 0, 2)       # (nb, M, block)
    bases = jnp.arange(nb, dtype=jnp.int32) * block
    offs = jnp.arange(block, dtype=jnp.int32)

    def body(next_allowed, xs):
        blk, base = xs                                    # (M, block), ()
        ok = blk & (base + offs[None, :] >= next_allowed[:, None])
        has = ok.any(axis=1)
        t_trig = base + jnp.argmax(ok, axis=1).astype(jnp.int32)
        na2 = jnp.where(has, t_trig + digit_ticks, next_allowed)
        return na2, jnp.where(has, t_trig, -1)

    _, trig = jax.lax.scan(body, jnp.zeros(M, jnp.int32), (a, bases))
    trig = trig.T                                         # (M, nb)
    order = jnp.argsort(trig < 0, axis=1, stable=True)    # valid first
    idx = jnp.take_along_axis(trig, order[:, :max_trig], axis=1)
    return idx, (trig >= 0).sum(axis=1).astype(jnp.int32)


def mode0_module_masks(op_channel_idx: np.ndarray, light: LightParams,
                       module_to_tpcs, tpc_to_module,
                       tpc_to_op_channel: np.ndarray):
    """Per-module trigger-group membership for the mode-0 scan
    (light_sim.py:418-428): which threshold groups belong to each module
    sharing channels with ``op_channel_idx``.

    Returns (gmasks (n_mod, n_grp) bool, ops_per_mod list of channel-id
    arrays) in ascending module-id order — the trigger emission order the
    solo and grouped paths must share.
    """
    n_grp = len(op_channel_idx) // light.op_channel_per_trig
    op_to_tpc = np.asarray(light.op_channel_to_tpc)
    tpc_ids = np.unique(op_to_tpc[op_channel_idx])
    mod_ids = np.unique([tpc_to_module[t] for t in tpc_ids])
    gmasks, ops_per_mod = [], []
    for mod_id in mod_ids:
        tpcs = module_to_tpcs[mod_id]
        op_channels = np.asarray(tpc_to_op_channel)[tpcs].ravel()
        mask = np.isin(op_channel_idx, op_channels)
        gmasks.append(mask.reshape(n_grp,
                                   light.op_channel_per_trig).any(axis=1))
        ops_per_mod.append(op_channels)
    return np.stack(gmasks), ops_per_mod


def mode0_group_threshold(op_channel_idx: np.ndarray,
                          light: LightParams) -> np.ndarray:
    """Per-trigger-group thresholds for the simulated channels
    (light_sim.py:399-404)."""
    thr = np.asarray(light.light_trig_threshold)
    thr = np.repeat(thr[:, None], light.op_channel_per_trig,
                    axis=-1).ravel()
    return thr[op_channel_idx].reshape(
        -1, light.op_channel_per_trig)[:, 0]


def get_triggers(signal, group_threshold: np.ndarray,
                 op_channel_idx: np.ndarray, i_subbatch: int,
                 light: LightParams, module_to_tpcs, tpc_to_module,
                 tpc_to_op_channel: np.ndarray, device_scan: bool = True):
    """Trigger scan (light_sim.get_triggers, :380-477).

    The threshold reduction and (by default) the dead-time walk run on
    device — the host pull shrinks from the (n_grp, nticks) boolean to a
    few trigger indices per module.  ``device_scan=False`` keeps the
    original host walk as the parity oracle.

    Returns (trigger_idx, trigger_op_channel_idx, trigger_type) numpy arrays.
    """
    shape = signal.shape
    n_grp = shape[0] // light.op_channel_per_trig
    sample_factor = round(light.light_digit_sample_spacing
                          / light.light_tick_size)
    grp_above_dev = group_above_threshold(
        jnp.asarray(signal), jnp.asarray(group_threshold, jnp.float32),
        per_trig=light.op_channel_per_trig, sample_factor=sample_factor)

    digit_ticks = int(np.ceil((light.light_trig_window[1]
                               + light.light_trig_window[0])
                              / light.light_tick_size))

    trigger_idx, trig_op, trig_type = [], [], []
    if light.light_trig_mode == 0:
        gmask_stack, ops_per_mod = mode0_module_masks(
            op_channel_idx, light, module_to_tpcs, tpc_to_module,
            tpc_to_op_channel)
        gmasks = list(gmask_stack)
        mod_ids = range(len(ops_per_mod))
        if device_scan:
            module_above = jnp.asarray(gmask_stack)[:, :, None] \
                & grp_above_dev[None, :, :]
            module_above = module_above.any(axis=1)       # (n_mod, T)
            T = int(module_above.shape[1])
            max_trig = T // max(digit_ticks, 1) + 1
            idx, counts = dead_time_trigger_scan(
                module_above, digit_ticks=digit_ticks, max_trig=max_trig)
            idx_np = np.asarray(idx)
            counts_np = np.asarray(counts)
            for m in range(len(mod_ids)):
                for k in range(int(counts_np[m])):
                    trigger_idx.append(int(idx_np[m, k]))
                    trig_type.append(0)
                    trig_op.append(ops_per_mod[m])
        else:
            grp_above = np.asarray(grp_above_dev)
            for gmask, op_channels in zip(gmasks, ops_per_mod):
                module_above = np.any(grp_above[gmask], axis=0)
                last_trigger = 0
                while module_above.any():
                    next_idx = int(np.nonzero(module_above)[0].min()
                                   + (last_trigger if last_trigger != 0
                                      else 0))
                    trigger_idx.append(next_idx)
                    trig_type.append(0)
                    trig_op.append(op_channels)
                    module_above = module_above[
                        next_idx - (last_trigger if last_trigger != 0
                                    else 0) + digit_ticks:]
                    last_trigger = next_idx + digit_ticks
    elif light.light_trig_mode == 1 and i_subbatch == 0:
        # beam mode: one forced trigger per event (light_sim.py:444-451)
        trigger_idx.append(0)
        trig_op.append(np.asarray(op_channel_idx))
        trig_type.append(1)

    if trigger_idx:
        return (np.array(trigger_idx), np.array(trig_op),
                np.array(trig_type))
    return (np.empty((0,), int), np.empty((0, len(op_channel_idx)), int),
            np.empty((0,), int))


@functools.partial(jax.jit,
                   static_argnames=('digit_samples', 'quantize',
                                    'ref_exact'))
def digitize_signal(signal, padded_trigger_idx, light: LightParams, *,
                    digit_samples: int, quantize: bool = True,
                    ref_exact: bool = False):
    """Interpolate to the ADC sample grid (light_sim.digitize_signal,
    :480-543) and truncate to the digitizer bit depth.

    Args:
        signal: (C, n_padded_ticks) waveform including front padding of
            ceil(trig_window[0]/tick).
        padded_trigger_idx: (ntrig,) trigger tick in the padded signal.
        ref_exact: reproduce the reference's *active* code line, which
            ignores `trigger_idx` entirely (light_sim.py:498: every
            trigger samples from padded tick 0 — its commented-out line
            shows the intended per-trigger window).  Default False =
            the intended semantics; the two agree whenever the trigger
            sits at tick 0 (beam mode), so the toggle only matters for
            mode-0 multi-trigger events.

    Returns:
        (ntrig, C, digit_samples).
    """
    f = light.light_digit_sample_spacing / light.light_tick_size
    pre = int(np.ceil(light.light_trig_window[0] / light.light_tick_size))
    if ref_exact:
        sample_tick = jnp.broadcast_to(
            jnp.arange(digit_samples)[None, :] * f,
            (padded_trigger_idx.shape[0], digit_samples))
    else:
        sample_tick = (padded_trigger_idx[:, None] - pre
                       + jnp.arange(digit_samples)[None, :] * f)  # (ntrig, M)
    i0 = jnp.floor(sample_tick).astype(jnp.int32)
    frac = sample_tick - i0
    n = signal.shape[-1]
    ok0 = (i0 >= 0) & (i0 <= n - 1)
    ok1 = (i0 + 1 >= 0) & (i0 + 1 <= n - 1)
    v0 = jnp.where(ok0[:, None, :],
                   signal[None, :, :][
                       jnp.zeros_like(i0)[:, None, :],
                       jnp.arange(signal.shape[0])[None, :, None],
                       jnp.clip(i0, 0, n - 1)[:, None, :]], 0.0)
    v1 = jnp.where(ok1[:, None, :],
                   signal[None, :, :][
                       jnp.zeros_like(i0)[:, None, :],
                       jnp.arange(signal.shape[0])[None, :, None],
                       jnp.clip(i0 + 1, 0, n - 1)[:, None, :]], 0.0)
    # linear interp with reference edge handling (light_sim.interp :241-271)
    out = jnp.where((i0 > n - 2)[:, None, :], 0.0,
                    v0 + (v1 - v0) * frac[:, None, :])
    if not quantize:  # truth samples are interpolated but not bit-truncated
        return out
    quant = 2 ** (16 - light.light_nbit)
    return jnp.round(out / quant) * quant
