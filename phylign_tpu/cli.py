"""phylign-tpu command line interface.

Mirrors the reference's Make targets (ref: /root/reference/Makefile:35-131,
README.md:243-277):

    phylign-tpu all       download + match + map
    phylign-tpu download  fetch batch artifacts from Zenodo
    phylign-tpu match     k-mer matching + candidate filtering (01..04)
    phylign-tpu map       alignment + aggregation + stats (05, output/)
    phylign-tpu stats     recompute output stats
    phylign-tpu test      self-contained golden test on a synthetic fixture
    phylign-tpu fixture   generate a synthetic 3-batch fixture + reads
    phylign-tpu clean     remove intermediates (keeps downloads)
    phylign-tpu version

`match`/`map`/`all` take query files as positional args (default: input/*).
"""

from __future__ import annotations

import argparse
import glob
import logging
import shutil
import sys
from pathlib import Path

from phylign_tpu.config import Config
from phylign_tpu.version import __version__


def _load_config(args) -> Config:
    p = Path(args.config)
    cfg = Config.from_yaml(p) if p.exists() else Config()
    over = {}
    if getattr(args, "batches", None):
        over["batches"] = args.batches
    if getattr(args, "nb_best_hits", None) is not None:
        over["nb_best_hits"] = args.nb_best_hits
    if getattr(args, "threshold", None) is not None:
        over["cobs_kmer_thres"] = args.threshold
    return cfg.with_overrides(**over)


def _inputs(args) -> list[str]:
    if args.queries:
        return list(args.queries)
    found = []
    for suf in ("fa", "fasta", "fq", "fastq"):
        found += glob.glob(f"input/*.{suf}") + glob.glob(f"input/*.{suf}.gz")
    if not found:
        sys.exit("no query files given and none found under input/")
    return sorted(found)


def cmd_match(args) -> None:
    from phylign_tpu.pipeline.stages import Pipeline

    cfg = _load_config(args)
    pl = Pipeline(cfg, args.workdir)
    stem = pl.preprocess(_inputs(args))
    pl.match(stem)
    out = pl.filter(stem)
    print(f"match done: {out}")


def cmd_map(args) -> None:
    from phylign_tpu.pipeline.stages import Pipeline

    cfg = _load_config(args)
    pl = Pipeline(cfg, args.workdir)
    stem = pl.preprocess(_inputs(args))
    pl.align(stem)
    out = pl.aggregate(stem)
    pl.stats(stem)
    print(f"map done: {out}")


def cmd_all(args) -> None:
    from phylign_tpu.pipeline.stages import Pipeline

    cfg = _load_config(args)
    pl = Pipeline(cfg, args.workdir)
    out = pl.run_all(_inputs(args))
    print(f"pipeline done: {out}")


def cmd_download(args) -> None:
    from phylign_tpu.pipeline.download import download_batch
    from phylign_tpu.pipeline.stages import Pipeline

    cfg = _load_config(args)
    pl = Pipeline(cfg, args.workdir)
    for batch in pl.batches():
        cobs_p, asms_p = pl.cobs_path(batch), pl.asms_path(batch)
        if cobs_p.exists() and asms_p.exists():
            print(f"{batch}: already present")
            continue
        download_batch(
            batch,
            Path(args.workdir) / cfg.download_dir,
            cfg.download_retries,
            cfg.download_retry_wait,
        )
        print(f"{batch}: downloaded")


def cmd_stats(args) -> None:
    from phylign_tpu.io.stats import compute_stats

    st = compute_stats(args.summary, args.queries)
    sys.stdout.write(st.to_tsv())


def cmd_clean(args) -> None:
    for d in ("intermediate", "output", "logs"):
        p = Path(args.workdir) / d
        if p.exists():
            shutil.rmtree(p)
            print(f"removed {p}")


def cmd_fixture(args) -> None:
    from phylign_tpu.testing import make_fixture

    paths = make_fixture(Path(args.workdir), n_batches=args.n_batches, seed=args.seed)
    print(f"fixture written under {args.workdir}:")
    for p in paths:
        print(f"  {p}")


def cmd_test(args) -> None:
    from phylign_tpu.testing import run_golden_test

    ok = run_golden_test(Path(args.workdir))
    if ok:
        print("test PASSED: sam_summary columns 1-3 match the fixture oracle")
    else:
        sys.exit("test FAILED: sam_summary differs from the fixture oracle")


def main(argv: list[str] | None = None) -> None:
    logging.basicConfig(
        stream=sys.stderr,
        level=logging.INFO,
        format="[%(asctime)s] (%(levelname)s) %(message)s",
    )
    ap = argparse.ArgumentParser(prog="phylign-tpu", description=__doc__)
    ap.add_argument("--version", action="version", version=__version__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, queries=True):
        p.add_argument("--config", default="config.yaml")
        p.add_argument("--workdir", default=".")
        p.add_argument("--batches", help="batches list file override")
        p.add_argument("--nb-best-hits", type=int, dest="nb_best_hits")
        p.add_argument("--threshold", type=float, help="cobs_kmer_thres override")
        if queries:
            p.add_argument("queries", nargs="*", help="query fast[aq] files")

    common(sub.add_parser("all", help="download + match + map"))
    common(sub.add_parser("match", help="k-mer match + filter"))
    common(sub.add_parser("map", help="align + aggregate + stats"))
    common(sub.add_parser("download", help="fetch batches from Zenodo"), queries=False)

    p = sub.add_parser("stats", help="recompute stats from a sam_summary")
    p.add_argument("summary")
    p.add_argument("--queries")

    p = sub.add_parser("clean", help="remove intermediates and outputs")
    p.add_argument("--workdir", default=".")

    p = sub.add_parser("fixture", help="generate a synthetic test fixture")
    p.add_argument("--workdir", default=".")
    p.add_argument("--n-batches", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)

    p = sub.add_parser("test", help="run the synthetic golden test")
    p.add_argument("--workdir", default=".")

    args = ap.parse_args(argv)
    {
        "all": cmd_all,
        "match": cmd_match,
        "map": cmd_map,
        "download": cmd_download,
        "stats": cmd_stats,
        "clean": cmd_clean,
        "fixture": cmd_fixture,
        "test": cmd_test,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
