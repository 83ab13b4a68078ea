"""A/B the SMEM row-table kernel mode vs the scalar row computation.

Times both modes of the folded:16 kernel on the bench workload and
bit-compares outputs on hardware.  See tools/probe_bound.py for the
ablation that motivated the table.
"""
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')
sys.path.insert(0, os.path.join(_HERE, 'tools'))

import numpy as np

from perf_guard import build_workload, timed  # noqa: E402
from larndsim_tpu.ops.current_pallas import current_pallas  # noqa: E402


def main():
    variant = 'folded'
    if '--variant' in sys.argv:
        variant = sys.argv[sys.argv.index('--variant') + 1]
    w = build_workload()
    kw = dict(n_steps=w['n_steps'], t_sig=w['t_sig'], mc_smear=True,
              shift_band=w['band'], variant=variant, pix_grp=16,
              min_step=float(w['sim'].min_step_size))
    args = (w['segs'], w['px'], w['py'], w['pix_valid'], w['response'],
            w['det'], w['key'])
    os.environ['LARNDSIM_PALLAS_ROWTBL'] = '0'
    ms0 = timed(current_pallas, *args, reps=3, **kw)
    out0 = np.asarray(current_pallas(*args, **kw))
    os.environ['LARNDSIM_PALLAS_ROWTBL'] = '1'
    ms1 = timed(current_pallas, *args, reps=3, **kw)
    out1 = np.asarray(current_pallas(*args, **kw))
    print(f'{variant}:16 scalar row_of: {ms0:.1f} ms   '
          f'row table: {ms1:.1f} ms   speedup {ms0 / ms1:.2f}x')
    print('bit-identical:', np.array_equal(out0, out1))


if __name__ == '__main__':
    main()
