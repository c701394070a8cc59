"""Prove a RANGE of real-scale pickles tips to a partial fixture file.

Usage: python scripts/gen_pickles_tips_range.py START COUNT OUT [block_log_n step_log_n]

Worker for parallel fixture banking: proves tips i in [START, START+COUNT)
with the same deterministic (state_hash, rng) schedule as
scripts/gen_pickles_fixture.py (state hash 0x5A5A+7i, rng 0xF1C5+i), so
partial files from several workers merge into the canonical
fixtures/pickles_2e{B}_s2e{S}_b{N}.json.gz via scripts/merge_pickles_fixtures.py.
Checkpoints after every tip. The wrap and step verifier indexes are
embedded in every partial (the worker computes them anyway), so the
merger never pays setup again.
"""

import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from mina_bridge_tpu.pickles import fixtures as pfx
from mina_bridge_tpu.pickles import verifier as pv


def main():
    start = int(sys.argv[1])
    count = int(sys.argv[2])
    out = pathlib.Path(sys.argv[3])
    block_log_n = int(sys.argv[4]) if len(sys.argv) > 4 else pv.REAL_BLOCK_LOG_N
    step_log_n = int(sys.argv[5]) if len(sys.argv) > 5 else pv.REAL_STEP_LOG_N
    t0 = time.time()
    _, _, wrap_index, _, _, _ = pv.wrap_setup(block_log_n, step_log_n)
    _, step_index, _, _, _ = pv.step_setup(step_log_n)
    print(f"setup done in {time.time()-t0:.1f}s", flush=True)
    tips = []
    for i in range(start, start + count):
        t1 = time.time()
        tip = pv.prove_tip(
            0x5A5A + 7 * i,
            rng=random.Random(0xF1C5 + i),
            log_n=block_log_n,
            step_log_n=step_log_n,
        )
        tips.append(tip)
        print(f"tip {i} proven in {time.time()-t1:.1f}s", flush=True)
        tmp = out.with_suffix(".tmp")
        pfx.save_tips(
            tmp, block_log_n, step_log_n, tips,
            wrap_index=wrap_index, step_index=step_index,
        )
        tmp.rename(out)
    print(f"range [{start},{start+count}) done in {time.time()-t0:.1f}s -> {out}", flush=True)


if __name__ == "__main__":
    main()
