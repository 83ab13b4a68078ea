"""Golden parity of the STAGED light-truth chain vs the reference source.

`sim.ref_exact_truth_staging` reproduces the reference's in-chain truth
threshold cuts (light_sim.py:175, :327, :528) instead of the linear
transfer-table chain.  Here the reference's OWN truth kernels
(`calc_scintillation_effect`, `calc_light_detector_response`,
`digitize_signal` from /root/reference/larndsim/light_sim.py) execute in
pure python through tests/ref_shim (the reference CI's CUDASIM mechanism)
on identical stage-0 inputs, and their digitized truth is compared
sample-for-sample against `models.light._staged_truth_res`.

Scope (documented in the staged-path docstring): slot-consistent inputs —
one contributor per channel — where the reference's per-tick truth-slot
dynamics are deterministic.  The scenario exercises every cut: increments
dropped inside both convolution stages, the id-at-output-tick quirk that
re-attributes tail photons to id -1 (emulated as the s1-activity mask),
and digitize's id-before-threshold ordering that emits pe_current == 0
records.
"""
import dataclasses
import math
import os
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
for _p in (os.path.join(_HERE, 'ref_shim'), '/root/reference'):
    if _p not in sys.path:
        sys.path.insert(0, _p)

from larndsim_tpu.models import light as light_model
from larndsim_tpu.params import load_light
from larndsim_tpu.params import light as light_params_mod

REF_DIR = '/root/reference/larndsim'
DETPROP = f'{REF_DIR}/detector_properties/module0.yaml'

# shrunken light geometry: keeps the pure-python reference kernels
# O(seconds) (conv window 0.08 us = 80 ticks)
# conv window 6 ticks: the reference's ACTIVE digitize line samples padded
# ticks [0, samples*spacing) regardless of trigger (the known
# ref_exact_light_digitize behavior), so every staged-cut band must land
# inside the first ~20 ticks
LIGHT_WINDOW = (0.0, 0.006)
TRIG_WINDOW = (0.004, 0.016)     # pre = 4 ticks, post = 16 ticks
SAMPLE_SPACING = 0.0016          # 1.6 ticks/sample -> real interp fractions
N_TICKS = 400
THRESHOLD = 0.1
#: measured-impulse SiPM model with sign-alternating taps: cancellation in
#: the response sums produces sub-threshold |s2| at slot-active ticks,
#: which is what fires digitize's id-before-threshold quirk (pe == 0 rows)
IMPULSE = np.array([0.6, -0.5, 0.45, -0.2, 0.3, 0.1, 0.05, 0.0])


@pytest.fixture(scope='module')
def ref_light():
    import larndsim.consts.light as ref_light_consts
    import larndsim.consts.sim as ref_sim_consts
    ref_light_consts.set_light_properties(DETPROP)
    ref_light_consts.LIGHT_WINDOW = LIGHT_WINDOW
    ref_light_consts.LIGHT_TRIG_WINDOW = TRIG_WINDOW
    ref_light_consts.LIGHT_DIGIT_SAMPLE_SPACING = SAMPLE_SPACING
    ref_light_consts.SIPM_RESPONSE_MODEL = 1
    ref_light_consts.IMPULSE_MODEL = IMPULSE.copy()
    ref_light_consts.IMPULSE_TICK_SIZE = 0.001
    ref_sim_consts.MC_TRUTH_THRESHOLD = THRESHOLD
    import larndsim.light_sim as ref_ls
    return ref_ls


@pytest.fixture(scope='module')
def our_light():
    light = load_light(DETPROP)
    new = dataclasses.replace(
        light, light_window=LIGHT_WINDOW, light_trig_window=TRIG_WINDOW,
        light_digit_sample_spacing=SAMPLE_SPACING, sipm_response_model=1,
        impulse_model=IMPULSE.copy(), impulse_tick_size=0.001)
    # keep the f64 YAML-seeded host scalars (the reference computes in
    # double from the same YAML); override the impulse with the test's
    hs = dict(light_params_mod.host_scalars(light))
    hs['impulse_model'] = IMPULSE.copy()
    light_params_mod.seed_host_scalars(new, hs)
    return new


def _scenario():
    """(C, nprof) photon magnitudes + tick placements, one contributor per
    channel.  Magnitudes chosen against module0's kernel scales
    (w_scint[0] ~ 0.19, RLC taps ~ 1e-3) so each stage keeps some
    increments and cuts others at THRESHOLD = 0.1."""
    ph = np.array([[300.0, 50.0, 8.0, 120.0],
                   [40.0, 20.0, 0.0, 0.0]], np.float32)
    it = np.array([[1, 2, 3, 8],
                   [5, 9, 0, 0]], np.int32)
    track_ids = np.array([7, 9], np.int64)
    return ph, it, track_ids


class TestStagedTruthGolden:

    def test_staged_matches_reference_kernels(self, ref_light, our_light):
        ref_ls = ref_light
        ph, it, track_ids = _scenario()
        C = ph.shape[0]
        KD = 4                       # truth slots on the reference side
        conv_ticks = int(math.ceil((LIGHT_WINDOW[1] - LIGHT_WINDOW[0])
                                   / 0.001))
        pre = int(math.ceil(TRIG_WINDOW[0] / 0.001))
        post = int(math.ceil(TRIG_WINDOW[1] / 0.001))
        digit_samples = int(math.ceil((TRIG_WINDOW[0] + TRIG_WINDOW[1])
                                      / SAMPLE_SPACING))

        # shared stage-0 series (identical construction on both sides)
        p = np.zeros((C, N_TICKS), np.float64)
        for c in range(C):
            np.add.at(p[c], it[c], ph[c].astype(np.float64))

        # ---- reference chain (shim-executed CUDA kernels) ----
        inc_id = np.full((C, N_TICKS, KD), -1, np.int64)
        inc_ph = np.zeros((C, N_TICKS, KD), np.float64)
        for c in range(C):
            nz = p[c] > 0
            inc_id[c, nz, 0] = track_ids[c]
            inc_ph[c, nz, 0] = p[c, nz]

        scint = np.zeros((C, N_TICKS), np.float64)
        scint_id = np.full((C, N_TICKS, KD), -1, np.int64)
        scint_ph = np.zeros((C, N_TICKS, KD), np.float64)
        ref_ls.calc_scintillation_effect[(C, N_TICKS), (1, 1)](
            p.copy(), inc_id, inc_ph, scint, scint_id, scint_ph)

        resp = np.zeros((C, N_TICKS), np.float64)
        resp_id = np.full((C, N_TICKS, KD), -1, np.int64)
        resp_ph = np.zeros((C, N_TICKS, KD), np.float64)
        ref_ls.calc_light_detector_response[(C, N_TICKS), (1, 1)](
            scint, scint_id, scint_ph, resp, resp_id, resp_ph)

        # manual sim_triggers padding (noise off), then digitize
        pad_id = np.full((C, pre, KD), -1, np.int64)
        pad_ph = np.zeros((C, pre, KD), np.float64)
        post_id = np.full((C, post, KD), -1, np.int64)
        post_ph = np.zeros((C, post, KD), np.float64)
        sig_pad = np.concatenate(
            [np.zeros((C, pre)), resp, np.zeros((C, post))], axis=1)
        id_pad = np.concatenate([pad_id, resp_id, post_id], axis=1)
        ph_pad = np.concatenate([pad_ph, resp_ph, post_ph], axis=1)

        digit = np.zeros((1, C, digit_samples), np.float64)
        digit_id = np.full((1, C, digit_samples, KD), -1, np.int64)
        digit_ph = np.zeros((1, C, digit_samples, KD), np.float64)
        ref_ls.digitize_signal[(1, C, digit_samples), (1, 1, 1)](
            sig_pad, np.arange(C), np.array([pre]),
            np.arange(C)[None, :], id_pad, ph_pad,
            digit, digit_id, digit_ph)

        # ---- our staged chain ----
        res, keep = light_model._staged_truth_res(
            ph, it, our_light, THRESHOLD, conv_ticks, N_TICKS,
            digit_samples, pre, N_TICKS + pre + post)

        # scenario sanity: the quirks are actually exercised
        ref_keep0 = digit_id[0, :, :, 0] != -1
        assert ref_keep0.any(), 'no truth records emitted'
        assert (digit_ph[0, :, :, 0][ref_keep0] == 0.0).any(), \
            'no pe_current == 0 records (id-before-threshold quirk unused)'
        # reference never uses slots beyond 0 for single contributors
        assert (digit_id[0, :, :, 1:] == -1).all()

        for c in range(C):
            np.testing.assert_array_equal(
                keep[c], ref_keep0[c],
                err_msg=f'keep mask mismatch on channel {c}')
            np.testing.assert_allclose(
                res[c][keep[c]].astype(np.float64),
                digit_ph[0, c, :, 0][ref_keep0[c]],
                rtol=1e-9, atol=1e-12,
                err_msg=f'pe_current mismatch on channel {c}')

    def test_staged_differs_from_linear(self, our_light):
        """The flag changes semantics: in-chain cuts truncate tails that
        the linear transfer chain keeps."""
        ph, it, _ = _scenario()
        conv_ticks = 6
        pre, post = 4, 16
        digit_samples = 13
        res, keep = light_model._staged_truth_res(
            ph, it, our_light, THRESHOLD, conv_ticks, N_TICKS,
            digit_samples, pre, N_TICKS + pre + post)
        res0, keep0 = light_model._staged_truth_res(
            ph, it, our_light, 0.0, conv_ticks, N_TICKS,
            digit_samples, pre, N_TICKS + pre + post)
        kept = res[keep]
        kept0 = res0[keep0]
        assert keep0.sum() >= keep.sum()
        assert not (np.array_equal(keep, keep0)
                    and np.allclose(kept, kept0)), \
            'threshold staging had no effect on the scenario'

    def test_flag_plumbs_through_worker(self, our_light):
        """staged=True routes _host_smeared_truth_sparse through the
        staged chain (different output from the linear path)."""
        C, K, nprof = 2, 3, 4
        rng = np.random.default_rng(3)
        lut_td = np.zeros((2, 2, 2, C, nprof), np.float32)
        lut_td[..., :] = rng.random((2, 2, 2, C, nprof)).astype(np.float32)
        lut_td /= lut_td.sum(axis=-1, keepdims=True)
        ids = rng.integers(0, 50, (C, K)).astype(np.int64)
        contrib = (rng.random((C, K)).astype(np.float32) * 3 + 0.5)
        t0 = (rng.random((C, K)).astype(np.float32) * 0.2)
        vox = rng.integers(0, 2, (C, K, 3)).astype(np.int32)
        args = (ids, contrib, t0, vox, lut_td, np.arange(C), our_light,
                THRESHOLD, 6, N_TICKS, 13, 4, 16, 0.0)
        lin = light_model._host_smeared_truth_sparse(*args)
        stg = light_model._host_smeared_truth_sparse(*args, staged=True)
        assert isinstance(stg, dict)
        # both paths attribute to the same contributor universe
        assert set(np.unique(stg['segment_id'])) <= set(ids.ravel())
        assert not (len(lin['tick']) == len(stg['tick'])
                    and np.array_equal(lin['tick'], stg['tick'])
                    and np.allclose(lin['pe_current'], stg['pe_current']))


class TestGoldenLightSignal:
    def test_signal_conv_matches_reference_kernels(self, ref_light,
                                                   our_light):
        """Scintillation + SiPM SIGNAL convolutions == the reference's own
        kernels (shim-executed) on identical input, including the
        inclusive [0, conv_ticks] kernel support of the reference loops
        (a conv_ticks-tap kernel fails this at small windows)."""
        import jax.numpy as jnp
        import larndsim.consts.light as ref_consts
        from larndsim_tpu.ops import light as light_ops

        ref_ls = ref_light
        ph, it, _ = _scenario()
        C = ph.shape[0]
        N = 64
        conv = 6
        gains = np.array([-2.5, -3.1])
        ref_consts.LIGHT_GAIN = gains.copy()

        p = np.zeros((C, N), np.float64)
        for c in range(C):
            np.add.at(p[c], it[c], ph[c].astype(np.float64))

        KD = 1
        no_id = np.full((C, N, KD), -1, np.int64)
        no_ph = np.zeros((C, N, KD), np.float64)
        scint_ref = np.zeros((C, N), np.float64)
        ref_ls.calc_scintillation_effect[(C, N), (1, 1)](
            p.copy(), no_id, no_ph, scint_ref,
            np.full((C, N, KD), -1, np.int64), np.zeros((C, N, KD)))
        resp_ref = np.zeros((C, N), np.float64)
        ref_ls.calc_light_detector_response[(C, N), (1, 1)](
            scint_ref, no_id, no_ph, resp_ref,
            np.full((C, N, KD), -1, np.int64), np.zeros((C, N, KD)))

        scint_ours = np.asarray(light_ops.calc_scintillation_effect(
            jnp.asarray(p, jnp.float32), our_light, conv_ticks=conv))
        resp_ours = np.asarray(light_ops.calc_light_detector_response(
            jnp.asarray(scint_ref, jnp.float32), jnp.asarray(gains),
            our_light, conv_ticks=conv))

        np.testing.assert_allclose(scint_ours, scint_ref, rtol=2e-4,
                                   atol=1e-5 * np.abs(scint_ref).max())
        np.testing.assert_allclose(resp_ours, resp_ref, rtol=2e-4,
                                   atol=1e-5 * np.abs(resp_ref).max())


def test_staged_records_match_dict_path(our_light):
    """Staged mode: as_records assembly == dict path + records helper
    (the explicit keep mask — including pe == 0 rows — flows through
    both emission branches identically)."""
    from larndsim_tpu.io import export
    rng = np.random.default_rng(4)
    C, K, nprof = 3, 2, 4
    lut_td = rng.random((2, 2, 2, C, nprof)).astype(np.float32)
    lut_td /= lut_td.sum(axis=-1, keepdims=True)
    ids = rng.integers(0, 40, (C, K)).astype(np.int64)
    contrib = (rng.random((C, K)).astype(np.float32) * 400 + 20)
    t0 = (rng.random((C, K)).astype(np.float32) * 0.004)
    vox = rng.integers(0, 2, (C, K, 3)).astype(np.int32)
    args = (ids, contrib, t0, vox, lut_td, np.arange(C), our_light,
            THRESHOLD, 6, 64, 13, 4, 16, 0.0)
    rec = light_model._host_smeared_truth_sparse(*args, as_records=True,
                                                 staged=True)
    rec['event_id'] = 5
    rec['trigger_id'] += 2
    ref = export.truth_sparse_to_records(
        light_model._host_smeared_truth_sparse(*args, staged=True), 5, 2)
    assert rec.shape == ref.shape and rec.shape[0] > 0
    for name in rec.dtype.names:
        np.testing.assert_array_equal(rec[name], ref[name], err_msg=name)
