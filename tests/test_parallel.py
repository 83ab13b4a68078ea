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
