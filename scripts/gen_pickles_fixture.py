"""Generate the real-scale Pickles tip fixture (wrap 2^17 / step 2^18).

Usage: python scripts/gen_pickles_fixture.py [block_log_n step_log_n batch [out]]

Proves `batch` tips at the real Proof-of-State domains (reference
README.md:485-486) over the shipped 2^16 SRS (chunked commitments) and
writes fixtures/pickles_2e{B}_s2e{S}_b{batch}.json.gz including the
wrap verifier-index commitments (so a cold bench machine skips the
multi-minute setup). Checkpoints after every tip.
"""

import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from mina_bridge_tpu.pickles import fixtures as pfx
from mina_bridge_tpu.pickles import verifier as pv


def main():
    block_log_n = int(sys.argv[1]) if len(sys.argv) > 1 else pv.REAL_BLOCK_LOG_N
    step_log_n = int(sys.argv[2]) if len(sys.argv) > 2 else pv.REAL_STEP_LOG_N
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    out = (
        pathlib.Path(sys.argv[4])
        if len(sys.argv) > 4
        else pfx.fixture_path(block_log_n, step_log_n, batch)
    )
    t0 = time.time()
    _, _, wrap_index, _, _, _ = pv.wrap_setup(block_log_n, step_log_n)
    _, step_index, _, _, _ = pv.step_setup(step_log_n)
    print(f"wrap_setup(2^{block_log_n}) done in {time.time()-t0:.1f}s", flush=True)
    tips = []
    for i in range(batch):
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
    print(f"all done in {time.time()-t0:.1f}s -> {out}", flush=True)


if __name__ == "__main__":
    main()
