"""Combine chunked score-matrix pickles
(parity with eval/combine_chunked_computations.py:125-250)."""

from __future__ import annotations

import argparse
import logging

from anncur_tpu.indexer.combine import combine_pickles


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--chunks", nargs="+", required=True, help="chunk pickles in mention order")
    p.add_argument("--out", required=True)
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)
    combine_pickles(args.chunks, args.out, overwrite=args.overwrite)


if __name__ == "__main__":
    main()
