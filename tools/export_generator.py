"""Export inference-only generator variables from any checkpoint.

Produces the committed-artifact format (orbax variables tree with
{params, batch_stats}) from either a full TrainState directory (a
quality run's ckpt_best, a Trainer epoch checkpoint) or an existing
variables checkpoint (pass-through re-save, e.g. an EMA export).
The result is what Enhancer/StreamingEnhancer/cli.enhance consume and
what `reports/trained_generator_r*` artifacts are made of.

    python tools/export_generator.py --ckpt /tmp/qrun/ckpt_best \
        --out reports/trained_generator_r03

Pure host-side IO: runs on CPU, never touches the chip.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="TrainState dir or variables dir")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from cmgan_tpu.checkpoint import restore_variables, save_variables

    tree = restore_variables(os.path.abspath(args.ckpt))
    if "gen_params" in tree:  # full TrainState layout
        step = int(tree.get("step", -1))
        variables = {"params": tree["gen_params"],
                     "batch_stats": tree["gen_stats"]}
    else:
        step = -1
        variables = {"params": tree["params"],
                     "batch_stats": tree["batch_stats"]}
    save_variables(os.path.abspath(args.out), variables)
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"exported {n:,}-param generator (step {step}) -> {args.out}")


if __name__ == "__main__":
    main()
