"""Induced-current synthesis: the hot kernel.

Reference semantics: detsim.tracks_current_mc (detsim.py:258-348) — Monte
Carlo charge-point sampling along each diffused segment, response-LUT lookup
per (segment, pixel, tick).

TPU-first redesign:

* One set of sample points per *segment* (not per (segment, pixel, tick)):
  a physical charge point lands in one place after diffusion and induces
  coherently on every pixel and tick.  The reference redraws the diffusion
  smear independently per (tick, step) — an artifact of its CUDA-grid
  parallelization that decorrelates ticks of the same waveform; marginal
  distributions are identical, so validation is statistical (SURVEY §7).
* The per-(tick, step) window test + nearest-bin LUT read becomes one fused
  gather over a (segments, pixels, ticks) block per scan step, with the step
  axis carried by `lax.scan` so peak memory stays at one block.
* `rho` (analytic diffused line-charge density, detsim.py:120-159) is kept
  as a vectorized utility for the deterministic validation path and tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..params.detector import DetectorParams
from ..segments import Segments


def rho(points, q, start, sigmas, segment):
    """Charge density of a diffused line segment, vectorized over points.

    Args:
        points: (..., 3) sample positions.
        q: total charge.
        start: (3,) segment start.
        sigmas: (3,) diffusion widths.
        segment: (3,) segment extent vector.

    Returns:
        (...,) charge density (analytic Gaussian-line integral, erf form).
    """
    points = jnp.asarray(points, jnp.float64 if jax.config.jax_enable_x64
                         else jnp.float32)
    start = jnp.asarray(start)
    sigmas = jnp.asarray(sigmas)
    segment = jnp.asarray(segment)

    Deltar = jnp.sqrt(jnp.sum(segment ** 2))
    u = segment / Deltar
    a = jnp.sum(u ** 2 / (2 * sigmas ** 2))
    factor = q / Deltar / (sigmas[0] * sigmas[1] * sigmas[2]
                           * jnp.sqrt(8 * jnp.pi ** 3))
    sqrt_a_2 = 2 * jnp.sqrt(a)

    d = points - start
    b = -jnp.sum(d * u / sigmas ** 2, axis=-1)
    delta = jnp.sum(d ** 2 / (2 * sigmas ** 2), axis=-1)
    integral = (jnp.sqrt(jnp.pi)
                * (-jax.scipy.special.erf(b / sqrt_a_2)
                   + jax.scipy.special.erf((b + 2 * a * Deltar) / sqrt_a_2))
                / sqrt_a_2)
    # strictly positive guards: in f32 the erf difference can round to a
    # tiny negative where the true value underflows
    ok = (factor > 0) & (integral > 0)
    log_int = jnp.log(jnp.where(ok, integral, 1.0))
    return jnp.where(ok, jnp.exp(b ** 2 / (4 * a) - delta
                                 + jnp.log(factor) + log_int), 0.0)


def signal_start_times(segs: Segments, det: DetectorParams) -> jnp.ndarray:
    """Drift-relative start time of each segment's signal window.

    (detsim.py:297: round((t_start - t0_start - padding)/dt) * dt)
    """
    dt = det.time_sampling
    return jnp.round((segs.t_start - segs.t0_start - det.time_padding)
                     / dt) * dt


def signal_window_start(segs: Segments, det: DetectorParams) -> jnp.ndarray:
    """Signal window start clamped at t=0.

    Ticks before the event start contribute nothing (detsim.py:299:
    `time_tick < 0: return`), so starting the *local* window at
    max(start, 0) produces identical output with up to ~half the tick axis
    (the reference's time_padding commonly exceeds the drift time).  The
    global placement compensates via `window_clamp_shift`.
    """
    return jnp.maximum(signal_start_times(segs, det), 0.0)


def window_clamp_shift(segs: Segments, det: DetectorParams) -> jnp.ndarray:
    """Time [us] by which the clamped local window was advanced."""
    sst = signal_start_times(segs, det)
    return jnp.maximum(sst, 0.0) - sst


@functools.partial(
    jax.jit, static_argnames=('n_steps', 't_sig', 'mc_smear', 'min_step'))
def current(segs: Segments, pix_x: jnp.ndarray, pix_y: jnp.ndarray,
            pix_valid: jnp.ndarray, response: jnp.ndarray,
            det: DetectorParams, key: jax.Array, *,
            n_steps: int, t_sig: int, mc_smear: bool = True,
            min_step: float = 0.001) -> jnp.ndarray:
    """Induced current per (segment, pixel, tick).

    Args:
        segs: drifted segment batch (S,).
        pix_x, pix_y: (S, P) pixel *centers* in cm (corner + pitch/2,
            detsim.py:286-288).
        pix_valid: (S, P) bool mask.
        response: (nx, ny, nt) response LUT.
        det: detector params.
        key: PRNG key for the diffusion smear.
        n_steps: static sample-point count cap per segment
            (>= max over batch of round(length/min_step) * multiplier).
        t_sig: static tick count of the output window.
        mc_smear: apply gaussian diffusion smearing (production path);
            False gives the deterministic midpoint sampler used for
            charge-conservation validation.
        min_step: MC step size in cm (sim.MIN_STEP_SIZE,
            consts/sim.py:27; configurable via simprop
            'min_step_size').  nstep = round(length/min_step).

    Returns:
        (S, P, t_sig) float32 induced current.
    """
    nx_r, ny_r, nt_r = response.shape
    dt = det.time_sampling
    resp_dt = det.response_sampling
    bin_size = det.response_bin_size

    # Endpoints ordered by z (detsim.py:290-295)
    swap = segs.z_start >= segs.z_end
    sx = jnp.where(swap, segs.x_end, segs.x_start)
    sy = jnp.where(swap, segs.y_end, segs.y_start)
    sz = jnp.where(swap, segs.z_end, segs.z_start)
    ex = jnp.where(swap, segs.x_start, segs.x_end)
    ey = jnp.where(swap, segs.y_start, segs.y_end)
    ez = jnp.where(swap, segs.z_start, segs.z_end)

    seg_vec = jnp.stack([ex - sx, ey - sy, ez - sz], axis=-1)  # (S, 3)
    length = jnp.sqrt(jnp.sum(seg_vec ** 2, axis=-1))
    safe_len = jnp.where(length > 0, length, 1.0)
    direction = seg_vec / safe_len[:, None]

    # Dynamic per-segment sample count, masked against the static cap.
    nstep = jnp.maximum(jnp.round(length / min_step), 1.0)
    nstep = jnp.minimum(nstep, n_steps).astype(jnp.int32)
    step_len = length / nstep

    plane = jnp.clip(segs.pixel_plane, 0, det.n_tpcs - 1)
    z_anode = det.tpc_borders[plane, 2, 0]
    t_start = signal_start_times(segs, det)                     # (S,)
    ticks = t_start[:, None] + jnp.arange(t_sig) * dt           # (S, T)

    charge = jnp.where(
        segs.valid & (length > 0) & pix_valid.any(axis=1),
        segs.n_electrons / nstep, 0.0)                           # (S,)

    max_xdist = bin_size * nx_r
    max_ydist = bin_size * ny_r

    # one diffusion draw per physical charge point, shared across pixels
    # and ticks; same stream layout as the Pallas backend (current_pallas.
    # prepare_points) so both backends agree bit-for-bit per key
    smear_all = (jax.random.normal(key, (3, segs.size, n_steps))
                 if mc_smear else None)

    def step_fn(acc, istep):
        arc = (istep + 0.5) * step_len                           # (S,)
        px = sx + arc * direction[:, 0]
        py = sy + arc * direction[:, 1]
        pz = sz + arc * direction[:, 2]
        if mc_smear:
            smear = smear_all[:, :, istep]
            pz = pz + smear[0] * segs.long_diff
            px = px + smear[1] * segs.tran_diff
            py = py + smear[2] * segs.tran_diff
        t0 = jnp.abs(pz - z_anode) / det.v_drift - det.time_window  # (S,)

        x_dist = jnp.abs(pix_x - px[:, None])                    # (S, P)
        y_dist = jnp.abs(pix_y - py[:, None])
        i_idx = jnp.round(x_dist / bin_size - 0.5).astype(jnp.int32)
        j_idx = jnp.round(y_dist / bin_size - 0.5).astype(jnp.int32)
        ij_ok = (pix_valid & (x_dist <= max_xdist) & (y_dist <= max_ydist)
                 & (i_idx >= 0) & (i_idx < nx_r)
                 & (j_idx >= 0) & (j_idx < ny_r))

        t_rel = ticks - t0[:, None]                              # (S, T)
        k_idx = jnp.round(t_rel / resp_dt).astype(jnp.int32)
        t_ok = ((t_rel > 0) & (t_rel < det.time_window)
                & (ticks >= 0)                                   # detsim.py:299
                & (k_idx >= 0) & (k_idx < nt_r))

        flat_ij = (jnp.where(ij_ok, i_idx, 0) * ny_r
                   + jnp.where(ij_ok, j_idx, 0))                 # (S, P)
        resp_flat = response.reshape(-1, nt_r)
        vals = resp_flat[flat_ij[:, :, None],
                         jnp.where(t_ok, k_idx, 0)[:, None, :]]  # (S, P, T)
        w = (ij_ok[:, :, None] & t_ok[:, None, :]
             & (istep < nstep)[:, None, None])
        contrib = jnp.where(w, vals, 0.0) * charge[:, None, None]
        return acc + contrib, None

    out = jnp.zeros((segs.size, pix_x.shape[1], t_sig), jnp.float32)
    out, _ = jax.lax.scan(step_fn, out, jnp.arange(n_steps))
    return out
