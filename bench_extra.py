"""Extra benchmarks (guide §1.4) — NOT the driver contract (bench.py is).

Per-query isolation with the noop sink (times the computation, not the
sink), job labels for the UI, optional .explain("formatted") dumps for the
plan evidence in plans/r07/, and a --count mode matching bench.py's timing
methodology (the driver times queries with .count()).

Usage:
  python bench_extra.py                          # 10 bench queries, noop, 3 passes
  python bench_extra.py dedup_minhash curation   # subset
  python bench_extra.py --explain plans/r07 --suffix before   # dump plans
  python bench_extra.py --count                  # use .count() like bench.py
  python bench_extra.py --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "extract_markdown",
    "extract_doc_agg",
    "extract_pdf_real",
    "extract_pdf_crypt",
    "dedup_minhash",
    "curation",
    "ann_topk",
    "text_quality",
    "token_counts",
    "pack_placement",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain", default=None, help="directory for plan dumps")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    ap.add_argument("--count", action="store_true", help=".count() instead of noop write")
    args = ap.parse_args()

    from zerox_spark.queries import QUERIES
    from zerox_spark.session import get_spark

    names = args.queries or BENCH_QUERIES
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(
        f"local[{args.cpus}]",
        app_name="zerox-bench-extra",
        shuffle_partitions=int(os.environ.get("BENCH_PARTITIONS", "128")),
        extra_conf={
            "spark.local.dir": os.environ.get(
                "BENCH_LOCAL_DIR", "/dev/shm/zerox-spark-shuffle"
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        import contextlib
        import io

        for name in names:
            df = QUERIES[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.explain, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}")
        spark.stop()
        return

    # warm Python workers / JIT once (matches bench.py's steady-state policy)
    QUERIES["text_quality"](spark, args.sf).count()
    QUERIES[names[0]](spark, args.sf).count()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.passes):
        for name in names:
            df = QUERIES[name](spark, args.sf)
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.monotonic()
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        n: {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "max": round(max(ts), 3),
        }
        for n, ts in samples.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
