"""Report numerical rank of score matrices
(parity with eval/compute_m2e_matrix_ranks.py:29-56)."""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np

from anncur_tpu.evalx.rank_probe import matrix_rank_report
from anncur_tpu.indexer import load_score_matrix


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--score_matrices", nargs="+", required=True)
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    reports = {}
    for path in args.score_matrices:
        mat = np.asarray(load_score_matrix(path)["ment_to_ent_scores"], np.float32)
        reports[path] = matrix_rank_report(mat)
        print(path, json.dumps(reports[path]))
    if args.out:
        with open(args.out, "w") as fout:
            json.dump(reports, fout, indent=2)


if __name__ == "__main__":
    main()
