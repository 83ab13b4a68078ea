"""Isolated fault probe for the folded kernel variants.

The folded/foldedT variants crash the Mosaic TPU worker (2026-08-18,
v5e) while passing in interpret mode.  This probe bisects the suspect
constructs in a *minimal* pallas kernel, one per subprocess, so a fault
kills only the child:

  a. dynamic sublane-axis slice  slab[pl.ds(0,1), pl.ds(q0, n_q), :]
     with q0 read from SMEM (unaligned to the (8,128) f32 tile)
  b. same with q0 8-aligned
  c. pltpu.roll on the minor axis of a 3D (grp, n_q, 128) block
  d. sublane-axis roll pltpu.roll(x, dq, axis=0) with dynamic dq
  e. double-dynamic slab slice slab[pl.ds(row, 1), pl.ds(q0, n_q), :]
     with BOTH row and q0 dynamic (the folded kernel's window read)
  f. async DMA of a dynamic middle-axis slice of a 3D ANY-space ref
     into a 3D VMEM scratch (the folded kernel's slab load)
  g. same DMA with the offset and size both 8-sublane-aligned

2026-08-18 result on v5e: a-e OK, f FAULTS, g OK — the folded slab
DMA faults only when the middle-axis offset/size are not multiples of
the 8-sublane tile.  Fix: align the folded slab window to 8 q-blocks.

Usage: python tools/probe_folded.py            # run all in subprocesses
       python tools/probe_folded.py a          # run one case inline
"""
from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

CASES = ('a', 'b', 'c', 'd', 'e', 'f', 'g')


def run_case(case: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, n_sub, grp, n_q = 8, 32, 4, 9
    slab_host = np.arange(n_rows * n_sub * 128, dtype=np.float32)
    slab3 = slab_host.reshape(n_rows, n_sub, 128)

    if case in ('a', 'b'):
        def kern(q_ref, x_ref, o_ref):
            q0 = q_ref[0]
            o_ref[...] = x_ref[pl.ds(0, 1), pl.ds(q0, n_q), :][0]

        q0 = jnp.array([3 if case == 'a' else 8], jnp.int32)
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_q, 128), jnp.float32),
        )(q0, jnp.asarray(slab3))
        q = 3 if case == 'a' else 8
        ref = slab3[0, q:q + n_q, :]
        np.testing.assert_array_equal(np.asarray(out), ref)

    elif case == 'c':
        def kern(r_ref, x_ref, o_ref):
            rem = r_ref[0]
            o_ref[...] = pltpu.roll(x_ref[...], 128 - rem, axis=2)

        rem = jnp.array([37], jnp.int32)
        x = jnp.asarray(slab3[:grp, :n_q, :].reshape(grp, n_q, 128))
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grp, n_q, 128), jnp.float32),
        )(rem, x)
        ref = np.roll(np.asarray(x), 128 - 37, axis=2)
        np.testing.assert_array_equal(np.asarray(out), ref)

    elif case == 'e':
        def kern(q_ref, x_ref, o_ref):
            row = q_ref[0]
            q0 = q_ref[1]
            o_ref[...] = x_ref[pl.ds(row, 1), pl.ds(q0, n_q), :][0]

        idx = jnp.array([5, 3], jnp.int32)
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_q, 128), jnp.float32),
        )(idx, jnp.asarray(slab3))
        ref = slab3[5, 3:3 + n_q, :]
        np.testing.assert_array_equal(np.asarray(out), ref)

    elif case in ('f', 'g'):
        q_sz = 16 if case == 'g' else n_q
        q_step = 8 if case == 'g' else 2

        def kern(x_hbm, o_ref, slab, sem):
            jt = pl.program_id(0)
            dma = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(jt * q_step, q_sz), :], slab, sem)
            dma.start()
            dma.wait()
            o_ref[0] = slab[...]

        out = pl.pallas_call(
            kern,
            grid=(2,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, n_rows, q_sz, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, n_rows, q_sz, 128),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((n_rows, q_sz, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(jnp.asarray(slab3))
        ref = np.stack([slab3[:, 0:q_sz, :],
                        slab3[:, q_step:q_step + q_sz, :]])
        np.testing.assert_array_equal(np.asarray(out), ref)

    elif case == 'd':
        def kern(d_ref, x_ref, o_ref):
            dq = d_ref[0]
            o_ref[...] = pltpu.roll(x_ref[...], dq, axis=0)

        dq = jnp.array([5], jnp.int32)
        x = jnp.asarray(slab3[0])
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_sub, 128), jnp.float32),
        )(dq, x)
        ref = np.roll(np.asarray(x), 5, axis=0)
        np.testing.assert_array_equal(np.asarray(out), ref)

    print(f'case {case}: OK', flush=True)


def main():
    if len(sys.argv) > 1:
        run_case(sys.argv[1])
        return
    for case in CASES:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), case],
            capture_output=True, text=True, timeout=300)
        tail = (r.stdout + r.stderr).strip().splitlines()
        tail = tail[-1][:140] if tail else '(no output)'
        status = 'OK' if r.returncode == 0 else f'FAIL rc={r.returncode}'
        print(f'{case}: {status}   {tail}')


if __name__ == '__main__':
    main()
