"""Structure bisect for the FEE kernel: probe (24 ms) -> real (~120 ms).

Adds real-kernel structural features to the fast probe one at a time:
  base     : sig+noise pipelined blocks, scratch state, trivial FSM
  prefetch : + PrefetchScalarGridSpec with 2 scalar-prefetch args
  anyio    : + 2 ANY inputs and 5 ANY outputs declared (unused)
  scratch  : + prods (5 MB) and hit-buffer scratch entries
  tail     : + two fori loops under pl.when (tail split)
Run on hardware: python tools/probe_fee2.py
"""
from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, 'tools'))
os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perf_guard import timed  # noqa: E402

TILE, CHUNK = 1024, 256


def make_call(feat, U, n_scan_p, n_scan, max_adc=30):
    spb = TILE // 128
    l128 = U // 128
    n_u, n_c = U // TILE, n_scan_p // CHUNK
    prefetch = feat != 'base'
    anyio = 'anyio' in feat
    vmouts = 'vmouts' in feat
    nouts = 5 if 'vmouts5' in feat else 1
    big_scratch = 'bigscratch' in feat
    tail = 'tailsplit' in feat

    def kernel(*refs):
        i = 0
        if prefetch:
            scal_ref, times_ref = refs[0], refs[1]
            i = 2
        sig_ref, noise_ref = refs[i], refs[i + 1]
        i += 2
        if anyio:
            thr_hbm, q0_hbm = refs[i], refs[i + 1]
            i += 2
            outs = refs[i:i + 5]
            i += 5
        elif vmouts:
            outs = refs[i:i + nouts]
            i += nouts
        else:
            outs = refs[i:i + 1]
            i += 1
        fstate = refs[i]
        istate = refs[i + 1]
        i += 2
        if big_scratch:
            prods, integ_s = refs[i], refs[i + 1]
            i += 2

        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            fstate[...] = jnp.zeros((8, spb, 128), jnp.float32)
            istate[...] = jnp.zeros((4, spb, 128), jnp.int32)

        def body_for(guarded):
            def tick(i2, _):
                t = c * CHUNK + i2
                cond = pl.when(t < n_scan) if guarded else pl.when(t >= 0)

                @cond
                def _():
                    fstate[0] = fstate[0] * 0.99 + sig_ref[i2]
                return 0
            return tick

        if tail:
            n_cp = pl.num_programs(1)

            @pl.when(c < n_cp - 1)
            def _a():
                jax.lax.fori_loop(0, CHUNK, body_for(False), 0)

            @pl.when(c == n_cp - 1)
            def _b():
                jax.lax.fori_loop(0, CHUNK, body_for(True), 0)
        else:
            jax.lax.fori_loop(0, CHUNK, body_for(True), 0)

    in_specs = [
        pl.BlockSpec((CHUNK, spb, 128), lambda u, c, *p: (c, u, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((5, CHUNK, spb, 128), lambda u, c, *p: (0, c, u, 0),
                     memory_space=pltpu.VMEM),
    ]
    n_in_arrays = 2
    if anyio:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        n_in_arrays += 2
    if anyio:
        out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 5
        out_shape = [jax.ShapeDtypeStruct((max_adc, l128, 128),
                                          jnp.float32)] * 2 \
            + [jax.ShapeDtypeStruct((max_adc, l128, 128), jnp.int32)] * 2 \
            + [jax.ShapeDtypeStruct((1, l128, 128), jnp.int32)]
    elif vmouts:
        out_specs = [pl.BlockSpec((1, max_adc, spb, 128),
                                  lambda u, c, *p: (c, 0, u, 0),
                                  memory_space=pltpu.VMEM)] * nouts
        out_shape = [jax.ShapeDtypeStruct((n_c, max_adc, l128, 128),
                                          jnp.float32)] * nouts
    else:
        out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = [jax.ShapeDtypeStruct((1, l128, 128), jnp.float32)]
    scratch = [pltpu.VMEM((8, spb, 128), jnp.float32),
               pltpu.VMEM((4, spb, 128), jnp.int32)]
    if big_scratch:
        scratch += [pltpu.VMEM((5, CHUNK, spb, 128), jnp.float32),
                    pltpu.VMEM((max_adc, spb, 128), jnp.float32)]

    if prefetch:
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(n_u, n_c), in_specs=in_specs,
            out_specs=out_specs, scratch_shapes=scratch)
        call = pl.pallas_call(
            kernel, grid_spec=gs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 2 ** 20))

        def fn(sig, noise, thrq):
            args = [jnp.zeros((1, 6), jnp.float32),
                    jnp.zeros((1, 2049), jnp.float32), sig, noise]
            if anyio:
                args += [thrq, thrq]
            return call(*args)
        return jax.jit(fn)
    else:
        call = pl.pallas_call(
            kernel, grid=(n_u, n_c), in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 2 ** 20))

        def fn(sig, noise, thrq):
            return call(sig, noise)
        return jax.jit(fn)


def main():
    U, n_scan, n_scan_p = 16384, 3805, 3840
    sig = jnp.zeros((n_scan_p, U // 128, 128), jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(1),
                              (5, n_scan_p, U // 128, 128))
    thrq = jnp.zeros((1, U // 128, 128), jnp.float32)
    for feat in ('vmouts', 'vmouts+bigscratch', 'vmouts+tailsplit', 'vmouts+bigscratch+tailsplit'):
        fn = make_call(feat, U, n_scan_p, n_scan)
        ms = timed(fn, sig, noise, thrq)
        print(f'{feat:>10}: {ms:7.1f} ms', flush=True)


if __name__ == '__main__':
    main()
