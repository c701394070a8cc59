"""Merge partial pickles tip fixtures into one canonical fixture.

Usage: python scripts/merge_pickles_fixtures.py OUT PART [PART...]

Concatenates the tips of the PART files (in argument order; all must
share (block_log_n, step_log_n)) and writes OUT with the wrap/step
verifier indexes taken from the first PART carrying them, else
recomputed via wrap_setup/step_setup.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from mina_bridge_tpu.pickles import fixtures as pfx
from mina_bridge_tpu.pickles import verifier as pv


def main():
    out = pathlib.Path(sys.argv[1])
    parts = [pathlib.Path(p) for p in sys.argv[2:]]
    shape = None
    tips = []
    wrap_index = None
    step_index = None
    for p in parts:
        bl, sl, part_tips, idx, sidx = pfx.load_tips(p)
        if shape is None:
            shape = (bl, sl)
        elif shape != (bl, sl):
            raise SystemExit(f"{p}: shape {(bl, sl)} != {shape}")
        tips.extend(part_tips)
        if wrap_index is None and idx is not None:
            wrap_index = idx
        if step_index is None and sidx is not None:
            step_index = sidx
        print(f"{p}: {len(part_tips)} tips", flush=True)
    if wrap_index is None:
        t0 = time.time()
        _, _, wrap_index, _, _, _ = pv.wrap_setup(*shape)
        print(f"wrap_setup recomputed in {time.time()-t0:.1f}s", flush=True)
    if step_index is None:
        _, step_index, _, _, _ = pv.step_setup(shape[1])
    pfx.save_tips(
        out, shape[0], shape[1], tips,
        wrap_index=wrap_index, step_index=step_index,
    )
    print(f"wrote {len(tips)} tips -> {out}", flush=True)


if __name__ == "__main__":
    main()
