"""Multi-chip sharding: the sharded charge step compiles and executes on a
virtual 8-device CPU mesh, with parameters sharded over modules and data
over events, and agrees with per-shard single-device execution."""
import numpy as np
import pytest


class TestMultichip:
    def test_dryrun_8_devices(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import jax
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        adc, uniq, fractions = out
        assert adc.shape[0] == ge.STATICS['n_unique_cap']
        assert np.isfinite(np.asarray(fractions)).all()

    def test_sharded_matches_single(self):
        """Same segments + key -> identical ADC on mesh vs single device."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        import __graft_entry__ as ge
        from larndsim_tpu.parallel.mesh import (make_mesh,
                                                make_sharded_charge_step,
                                                stack_module_params)
        from larndsim_tpu.models.charge import charge_step

        det, segs, response = ge._example_setup(n_segments=8)
        mesh = make_mesh(4, n_modules=2)
        n_mod, n_ev = mesh.shape['modules'], mesh.shape['events']
        det_stack = stack_module_params([det] * n_mod)
        det_stack = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P('modules'))),
            det_stack)

        pad = segs.size
        data_sharding = NamedSharding(mesh, P('modules', 'events'))
        stacked = jax.tree.map(
            lambda x: jax.device_put(
                jnp.broadcast_to(x[None], (n_mod * n_ev,) + x.shape)
                .reshape(n_mod, n_ev * pad, *x.shape[1:]), data_sharding),
            segs)
        key0 = jax.random.PRNGKey(42)
        keys = jnp.broadcast_to(jax.random.key_data(key0).astype(jnp.uint32),
                                (n_mod, n_ev, 2))
        keys = jax.device_put(keys, data_sharding)

        step = make_sharded_charge_step(mesh, det_stack, response,
                                        **ge.STATICS)
        adc_sharded, uniq_sharded, _, n_hits = step(stacked, det_stack,
                                                    response, keys)

        uniq1, _, adc1, fee1, _, _, _ = charge_step(
            segs, det, response, jax.random.key_data(key0).astype(jnp.uint32),
            **ge.STATICS)
        for im in range(n_mod):
            for ie in range(n_ev):
                np.testing.assert_array_equal(np.asarray(adc_sharded[im, ie]),
                                              np.asarray(adc1))
        expected_hits = int((np.asarray(fee1.n_adc) > 0).sum()) * n_mod * n_ev
        assert int(n_hits) == expected_hits


class TestMultiDeviceCLI:
    """The production CLI's multi-chip path: event groups round-robin over
    devices with per-device param copies, results gathered in submission
    order — the output file must be byte-identical to single-device."""

    @pytest.fixture(scope='class')
    def files(self, tmp_path_factory):
        from larndsim_tpu.cli.simulate_pixels import run_simulation
        from larndsim_tpu.params import load_detector
        from larndsim_tpu.assets.make_input import write_input
        ref = '/root/reference/larndsim'
        detprop = f'{ref}/detector_properties/module0.yaml'
        pixel = f'{ref}/pixel_layouts/multi_tile_layout-2.3.16.yaml'
        simprop = f'{ref}/simulation_properties/singles_sim.yaml'
        tmp = tmp_path_factory.mktemp('cli_multidev')
        in_file = str(tmp / 'input.h5')
        dm = load_detector(detprop, pixel)
        write_input(in_file, dm.tpc_borders, n_events=3, tracks_per_event=1,
                    segments_per_track=8, dEdx=15.0, seed=7)
        outs = []
        for n_dev in (1, 3):
            out = str(tmp / f'out_nd{n_dev}.h5')
            run_simulation(in_file, out, config='module0',
                           detector_properties=detprop, pixel_layout=pixel,
                           simulation_properties=simprop,
                           response_file='__missing__.npy',
                           light_lut_filename='__missing__.npz',
                           light_det_noise_filename='__missing__.npy',
                           rand_seed=42, step_scale=16.0,
                           event_group_size=2, n_devices=n_dev)
            outs.append(out)
        return outs

    def test_byte_identical_output(self, files):
        import h5py
        f1, f4 = files

        def collect(path):
            data = {}
            with h5py.File(path) as f:
                def visit(name, obj):
                    if isinstance(obj, h5py.Dataset):
                        data[name] = np.asarray(obj)
                f.visititems(visit)
            return data

        d1, d4 = collect(f1), collect(f4)
        assert set(d1) == set(d4)
        assert 'packets' in d1 and len(d1['packets']) > 0
        for name in sorted(d1):
            a, b = d1[name], d4[name]
            assert a.shape == b.shape, name
            if a.dtype.names:
                for col in a.dtype.names:
                    np.testing.assert_array_equal(b[col], a[col],
                                                  err_msg=f'{name}[{col}]')
            else:
                np.testing.assert_array_equal(b, a, err_msg=name)


@pytest.mark.slow
class TestModuleParallelCLI:
    """Module-axis parallelism in the production CLI (SURVEY §2.6 P9,
    reference module loop cli/simulate_pixels.py:678-715): with mod2mod
    variation and n_devices > 1 modules run concurrently on their own
    chips; file writes are gated in module order, so the output file must
    be byte-identical for n_devices in {1, 4, 8} on the virtual mesh."""

    @pytest.fixture(scope='class')
    def files(self, tmp_path_factory):
        from larndsim_tpu.cli.simulate_pixels import run_simulation
        from larndsim_tpu.params import load_detector
        from larndsim_tpu.assets.make_input import write_input
        ref = '/root/reference/larndsim'
        detprop = f'{ref}/detector_properties/2x2.yaml'
        pixels = [f'{ref}/pixel_layouts/multi_tile_layout-2.4.16.yaml',
                  f'{ref}/pixel_layouts/multi_tile_layout-2.5.16.yaml']
        simprop = f'{ref}/simulation_properties/2x2_NuMI_sim.yaml'
        tmp = tmp_path_factory.mktemp('cli_modpar')
        in_file = str(tmp / 'input.h5')
        dm = load_detector(detprop, pixels[0])
        write_input(in_file, dm.tpc_borders, n_events=2,
                    tracks_per_event=4, segments_per_track=6, dEdx=15.0,
                    seed=5)
        outs = {}
        for n_dev in (1, 4, 8):
            out = str(tmp / f'out_nd{n_dev}.h5')
            run_simulation(
                in_file, out, config='2x2',
                detector_properties=detprop,
                pixel_layout=[pixels[0], pixels[1]],
                simulation_properties=simprop,
                response_file=['__missing_a__.npy', '__missing_b__.npy'],
                light_lut_filename=['__missing__.npz', '__missing__.npz'],
                light_det_noise_filename='__missing__.npy',
                mod2mod_variation=True, rand_seed=99, step_scale=32.0,
                event_group_size=2, n_devices=n_dev)
            outs[n_dev] = out
        return outs

    def test_byte_identical_across_n_devices(self, files):
        import h5py

        def collect(path):
            data = {}
            with h5py.File(path) as f:
                def visit(name, obj):
                    if isinstance(obj, h5py.Dataset):
                        data[name] = np.asarray(obj)
                f.visititems(visit)
            return data

        base = collect(files[1])
        assert 'packets' in base and len(base['packets']) > 0
        assert any(n.startswith('light_wvfm') for n in base)
        for n_dev in (4, 8):
            other = collect(files[n_dev])
            assert set(base) == set(other), n_dev
            for name in sorted(base):
                a, b = base[name], other[name]
                assert a.shape == b.shape, (n_dev, name)
                if a.dtype.names:
                    for col in a.dtype.names:
                        np.testing.assert_array_equal(
                            b[col], a[col],
                            err_msg=f'nd{n_dev}:{name}[{col}]')
                else:
                    np.testing.assert_array_equal(
                        b, a, err_msg=f'nd{n_dev}:{name}')
