"""Module-to-module variation: 4 modules, per-module pixel layouts /
responses / LUTs (BASELINE config #4), end-to-end on the 2x2 geometry."""
import h5py
import numpy as np
import pytest

from larndsim_tpu.cli.simulate_pixels import run_simulation
from larndsim_tpu.params import load_detector, get_module_ids
from larndsim_tpu.assets.make_input import write_input

REF = '/root/reference/larndsim'
DETPROP = f'{REF}/detector_properties/2x2.yaml'
PIXELS = [f'{REF}/pixel_layouts/multi_tile_layout-2.4.16.yaml',
          f'{REF}/pixel_layouts/multi_tile_layout-2.5.16.yaml']
SIMPROP = f'{REF}/simulation_properties/2x2_NuMI_sim.yaml'


@pytest.mark.slow
class TestMod2Mod:
    def test_per_module_params(self):
        """Per-module scalar resolution (consts/detector.py:182-196)."""
        mods = get_module_ids(DETPROP)
        assert len(mods) == 4
        vals = [float(load_detector(DETPROP, [PIXELS[0]] * 4,
                                    i_module=m).params.response_bin_size)
                for m in mods]
        # 2x2.yaml: response_bin_size: [0.04434, 0.04434, 0.0387975, 0.04434]
        assert vals[2] != vals[0]
        assert vals[0] == pytest.approx(0.04434)
        assert vals[2] == pytest.approx(0.0387975)

    def test_end_to_end_mod2mod(self, tmp_path):
        geo = load_detector(DETPROP, PIXELS[0])
        in_file = str(tmp_path / 'in.h5')
        out_file = str(tmp_path / 'out.h5')
        write_input(in_file, geo.tpc_borders, n_events=1,
                    tracks_per_event=4, segments_per_track=6, dEdx=15.0,
                    seed=5)
        # 2-entry lists expanded per-module by the config's *_ID indirection
        # (PIXEL_LAYOUT_ID/RESPONSE_ID = [0, 0, 1, 0])
        run_simulation(
            in_file, out_file, config='2x2',
            detector_properties=DETPROP,
            pixel_layout=[PIXELS[0], PIXELS[1]],
            simulation_properties=SIMPROP,
            response_file=['__missing_a__.npy', '__missing_b__.npy'],
            response_id=None,
            light_lut_filename=['__missing__.npz', '__missing__.npz'],
            light_det_noise_filename='__missing__.npy',
            mod2mod_variation=True, rand_seed=99, step_scale=32.0)
        with h5py.File(out_file) as f:
            pk = np.array(f['packets'])
            assert (pk['packet_type'] == 0).sum() > 0
            assert 'segments' in f
            # per-module light waveforms merged along the channel axis
            assert 'light_wvfm' in f
            wv = f['light_wvfm']
            assert wv.shape[1] == 384  # all 4 modules' channels
            # per-module light_dat datasets
            for i in range(4):
                assert f'light_dat/light_dat_module{i}' in f
