"""Coverage for config registry, pixel LUTs, RNG statistics, and units."""
import numpy as np
import pytest

import jax

from larndsim_tpu import units
from larndsim_tpu.config import CONFIG_MAP, get_config, list_config_keys
from larndsim_tpu.utils.pixel_lut import PixelLUT
from larndsim_tpu.params import load_detector, load_light, load_sim


class TestConfigRegistry:
    def test_reference_keywords_present(self):
        """Same keyword set as the reference config.yaml."""
        expected = {'module0', '2x2_no_modvar', '2x2_mpvmpr_no_modvar',
                    '2x2_non_beam_no_modvar', '2x2', '2x2_old_response',
                    '2x2_mpvmpr', '2x2_mpvmpr_old_response', 'ndlar'}
        assert expected <= set(list_config_keys())

    def test_all_configs_resolve(self):
        for key in list_config_keys():
            cfg = get_config(key)
            for cat in ('SIM_PROPERTIES', 'PIXEL_LAYOUT', 'DET_PROPERTIES',
                        'RESPONSE'):
                assert cat in cfg

    def test_2x2_mod2mod_indirection(self):
        cfg = get_config('2x2')
        assert cfg['MOD2MOD_VARIATION'] is True
        assert cfg['PIXEL_LAYOUT_ID'] == [0, 0, 1, 0]
        assert isinstance(cfg['PIXEL_LAYOUT'], list)

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            get_config('nonsense')


class TestPixelLUT:
    def test_roundtrip_and_lookup(self, tmp_path):
        keys = np.array([10, 3, 99, 42], np.int64)
        values = np.array([1.0, 2.0, 3.0, 4.0])
        lut = PixelLUT(keys, values, default=7.5)
        path = tmp_path / 'thresholds.npz'
        lut.save(str(path))
        lut2 = PixelLUT.load(str(path))
        got = np.asarray(lut2.lookup(np.array([3, 42, 5, 99, 10])))
        np.testing.assert_allclose(got, [2.0, 4.0, 7.5, 3.0, 1.0])
        assert 42 in lut2 and 5 not in lut2

    def test_thresholds_affect_triggering(self):
        """Per-pixel thresholds from an npz flow through the charge batch."""
        import jax.numpy as jnp
        from larndsim_tpu.ops import fee as fee_mod
        from test_charge_chain import DETPROP, PIXEL
        det = load_detector(DETPROP, PIXEL).params
        det0 = det.replace(reset_noise_charge=jnp.float32(0),
                           uncorrelated_noise_charge=jnp.float32(0),
                           discriminator_noise=jnp.float32(0))
        wf = np.zeros((2, 300), np.float32)
        wf[:, 100:120] = 5e2  # same waveform on both pixels
        tick_times = jnp.linspace(0, 200.0, 301)
        # pixel 0: low threshold -> triggers; pixel 1: high -> silent
        thr = jnp.array([1e3, 1e9], jnp.float32)
        res = fee_mod.get_adc_values(jnp.asarray(wf), tick_times, thr, det0,
                                     jax.random.PRNGKey(0), max_adc=5,
                                     n_scan=330)
        assert int(res.n_adc[0]) > 0
        assert int(res.n_adc[1]) == 0


class TestRngStatistics:
    def test_diffusion_smear_moments(self):
        """MC diffusion draws reproduce the long/tran widths statistically
        (SURVEY §7.5: xoroshiro vs threefry parity is statistical)."""
        import jax.numpy as jnp
        from larndsim_tpu.ops.current_pallas import prepare_points
        from larndsim_tpu import segments as seg_mod
        from test_charge_chain import DETPROP, PIXEL, make_test_tracks
        from larndsim_tpu.ops.quench import quench
        from larndsim_tpu.ops.drift import drift
        from larndsim_tpu.params import physics

        det = load_detector(DETPROP, PIXEL).params
        tr = make_test_tracks(det, n=4)
        segs = seg_mod.from_structured(tr)
        segs = quench(segs, det, physics.BIRKS)
        segs = drift(segs, det)
        segs = segs.replace(long_diff=jnp.full(4, 0.05),
                            tran_diff=jnp.full(4, 0.02))

        xs, ys, shift, phase, charge, nstep, _, _ = prepare_points(
            segs, det, jax.random.PRNGKey(0), n_steps=1024, mc_smear=True,
            ratio=1)
        xs0, ys0, *_ = prepare_points(
            segs, det, jax.random.PRNGKey(0), n_steps=1024, mc_smear=False,
            ratio=1)
        dx = np.asarray(xs - xs0)
        dy = np.asarray(ys - ys0)
        mask = np.asarray(xs0) < 1e8
        assert abs(dx[mask].std() - 0.02) < 0.002
        assert abs(dy[mask].std() - 0.02) < 0.002
        assert abs(dx[mask].mean()) < 0.002


class TestUnits:
    def test_hep_coherence(self):
        assert units.cm == 10 * units.mm
        assert units.mus == 1e3 * units.ns
        assert units.mV == pytest.approx(1e-9 * units.MeV / units.e)
        # kV/cm in (MeV/e)/mm: 1e-3 MeV/e / 10 mm
        assert units.kV / units.cm == pytest.approx(1e-4)


class TestMemoryLogger:
    def test_hdf5_store(self, tmp_path):
        """HDF5 store path (memory_logger.py:86-96 layout): one table per
        archived phase with the reference's five field names."""
        from larndsim_tpu.utils import MemoryLogger
        from larndsim_tpu.utils.memlog import FIELDS
        import h5py
        ml = MemoryLogger()
        ml.start()
        ml.take_snapshot()
        ml.take_snapshot()
        ml.archive('loading')
        ml.take_snapshot()
        ml.archive('loop_mod0')
        out = str(tmp_path / 'mem.h5')
        ml.store(out)
        with h5py.File(out) as f:
            assert set(f.keys()) == {'loading', 'loop_mod0'}
            rec = np.asarray(f['loading'])
            assert rec.dtype.names == FIELDS
            assert len(rec) == 2
            assert (rec['time'] >= 0).all()
            assert (rec['cpu_mem_used'] >= 0).all()
            assert rec['cpu_mem_peak'].max() > 0

    def test_read_memlog_roundtrip(self, tmp_path):
        """read_memlog is the documented consumer path (the plain layout
        is NOT pandas.read_hdf-compatible): DataFrames per phase when
        pandas imports, matching the stored snapshots."""
        from larndsim_tpu.utils import MemoryLogger
        from larndsim_tpu.utils.memlog import FIELDS, read_memlog
        ml = MemoryLogger()
        ml.start()
        ml.take_snapshot()
        ml.take_snapshot()
        ml.archive('phase_a')
        out = str(tmp_path / 'mem.h5')
        ml.store(out)
        tables = read_memlog(out)
        assert set(tables) == {'phase_a'}
        tab = tables['phase_a']
        cols = (list(tab.columns) if hasattr(tab, 'columns')
                else list(tab.dtype.names))
        assert cols == list(FIELDS)
        assert len(tab) == 2

    def test_npz_store(self, tmp_path):
        from larndsim_tpu.utils import MemoryLogger
        ml = MemoryLogger()
        ml.start()
        ml.take_snapshot()
        ml.archive('phase')
        out = str(tmp_path / 'mem.npz')
        ml.store(out)
        dat = np.load(out)
        assert dat['phase'].shape == (1, 5)


class TestDumpTreeHelpers:
    """Pure parts of the edep-sim converter (the ROOT loop itself needs
    PyROOT): spill-counter semantics (dumpTree.py:198-237) and the
    ARCUBE_ACTIVE_VOLUME event filter (dumpTree.py:255-262)."""

    def test_spill_timer(self):
        from larndsim_tpu.cli.dump_tree import SpillTimer
        t = SpillTimer(1.2)
        # counter advances on spill-id *change*, not per event
        assert t.t_spill(5) == 0.0
        assert t.t_spill(5) == 0.0
        assert t.t_spill(7) == pytest.approx(1.2e6)
        assert t.t_spill(7) == pytest.approx(1.2e6)
        assert t.t_spill(9) == pytest.approx(2.4e6)
        # no event_spill_map -> every event at t=0
        assert SpillTimer(None).t_spill(123) == 0.0

    def test_active_volume_filter(self, monkeypatch):
        from larndsim_tpu.cli.dump_tree import passes_active_volume
        assert passes_active_volume(['volTPCActive', 'x'], False)
        assert not passes_active_volume(['x'], False)
        assert passes_active_volume(['x'], True)
        assert not passes_active_volume([], True)
        monkeypatch.setenv('ARCUBE_ACTIVE_VOLUME', 'myVol')
        assert passes_active_volume(['myVol'], False)
        assert not passes_active_volume(['volTPCActive'], False)


class TestBatchPixelCounts:
    def test_matches_numpy_unique(self):
        """batch_pixel_counts sizes the static unique axis: element [1]
        must equal the true unique count (cap >= actual is the invariant
        simulate_charge_batch relies on) and [0] the additive bound."""
        from larndsim_tpu.ops.accumulate import batch_pixel_counts
        rng = np.random.default_rng(7)
        pixels = rng.integers(-1, 40, size=(13, 6)).astype(np.int32)
        npix = (pixels >= 0).sum(axis=1).astype(np.int32)
        counts = np.asarray(batch_pixel_counts(pixels, npix))
        real = pixels[pixels >= 0]
        assert counts[0] == len(real)
        assert counts[1] == len(np.unique(real))

    def test_all_padding(self):
        from larndsim_tpu.ops.accumulate import batch_pixel_counts
        pixels = np.full((4, 3), -1, np.int32)
        counts = np.asarray(batch_pixel_counts(
            pixels, np.zeros(4, np.int32)))
        assert counts.tolist() == [0, 0]
