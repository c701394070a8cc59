"""Block-shape corruption probe: which proof components bind?

Corrupts one component at a time in the wrap proof batch and reports
whether kv.verify notices. Debugging aid for the z1-acceptance soundness
bug (round 3)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import tests.conftest  # noqa: F401  (cpu backend + fingerprinted cache)

import dataclasses
import random

import jax.numpy as jnp
import numpy as np

from mina_bridge_tpu.kimchi import verifier as kv
from mina_bridge_tpu.pickles import verifier as pickles
from mina_bridge_tpu.curves import PALLAS
from tests.test_kimchi_device import rand_weights as rw


def main():
    tip1 = pickles.prove_tip(123456789)
    tip2 = pickles.prove_tip(987654321)
    dtips = pickles.device_proofs([tip1, tip2])
    w = rw(PALLAS, 2, n=3)
    _, _, dindex, _, _ = pickles.block_setup(pickles.BLOCK_LOG_N)

    wrap = dtips.wrap

    def check(tag, **repl):
        bad = dataclasses.replace(wrap, **repl)
        ok = bool(kv.verify(dindex, bad, w[:, :2]))
        print(f"{tag:>16}: verify={ok}")

    print("good:", bool(kv.verify(dindex, wrap, w[:, :2])))
    check("z1+1", z1=wrap.z1.at[1, 0].add(1))
    check("z2+1", z2=wrap.z2.at[1, 0].add(1))
    check("sg.x^1", sg=wrap.sg.at[1, 0, 0].add(1))
    check("delta.x^1", delta=wrap.delta.at[1, 0, 0].add(1))
    check("eval3^1", evals=wrap.evals.at[1, 3, 0, 0].add(1))
    check("ft_eval1^1", ft_eval1=wrap.ft_eval1.at[1, 0].add(1))
    check("lr0^1", lr=wrap.lr.at[1, 0, 0, 0, 0].add(1))
    check("w_comm^1", w_comm=wrap.w_comm.at[1, 0, 0, 0].add(1))
    check("public^1", public=wrap.public.at[1, 0, 0].add(1))
    check("prev_chals^1", prev_chals=wrap.prev_chals.at[1, 0, 0, 0].add(1))


if __name__ == "__main__":
    main()
