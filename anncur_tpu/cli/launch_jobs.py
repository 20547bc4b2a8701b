"""Generate/launch train + eval job grids
(parity with utils/launch_eval_and_bienc_distill_jobs.py:147-550)."""

from __future__ import annotations

import argparse
import json
import logging

from anncur_tpu.utils.launcher import launch, make_eval_jobs, make_train_jobs

LOGGER = logging.getLogger("anncur_tpu.launch_jobs")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", choices=["train", "eval"], required=True)
    p.add_argument("--base_config", default="", help="train: base config json")
    p.add_argument("--grid", required=True, help="JSON dict of param -> list of values")
    p.add_argument("--result_probe", default="", help="skip-done path template over grid keys")
    p.add_argument("--mode", default="inductive", help="eval: transductive|inductive")
    p.add_argument("--score_matrix_template", default="")
    p.add_argument("--res_dir_template", default="")
    p.add_argument("--extra_args", default="")
    p.add_argument("--backend", default="print", help="print | local | template with {cmd}")
    p.add_argument("--no_skip_done", action="store_true")
    args = p.parse_args(argv)

    grid = json.loads(args.grid)
    if args.kind == "train":
        jobs = make_train_jobs(args.base_config, grid, result_probe=args.result_probe or None)
    else:
        jobs = make_eval_jobs(
            args.mode, args.score_matrix_template, args.res_dir_template, grid, args.extra_args
        )
    launch(jobs, backend=args.backend, skip_done=not args.no_skip_done)


if __name__ == "__main__":
    main()
