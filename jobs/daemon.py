"""Long-running collection daemon — the ``groved`` entrypoint analog
(grove/entrypoints/local_daemon.py): scheduler loop with periodic config
refresh over the Spark fleet plan.

    spark-submit --py-files grove_spark.zip jobs/daemon.py \
        --configs /etc/grove/configs --sequences s3://bucket/sequences \
        --state /var/lib/grove_spark/state --out s3://bucket/out \
        [--refresh 300] [--tick 0.25] [--max-ticks N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--configs", required=True, help="config document tree")
    ap.add_argument("--sequences", required=True, help="sequences table path")
    ap.add_argument("--state", required=True, help="run-state root")
    ap.add_argument("--out", default=None, help="sink root (optional)")
    ap.add_argument("--refresh", type=float, default=300.0)
    ap.add_argument("--tick", type=float, default=0.25)
    ap.add_argument("--max-ticks", type=int, default=None)
    args = ap.parse_args()

    from grove_spark.config import run_daemon
    from grove_spark.session import get_spark
    from grove_spark.state.runstate import RunState

    spark = get_spark("grove_daemon")
    reports = run_daemon(
        spark,
        args.configs,
        args.sequences,
        RunState(args.state),
        out_path=args.out,
        refresh_s=args.refresh,
        tick_s=args.tick,
        max_ticks=args.max_ticks,
    )
    ran = sum(1 for r in reports if r.get("due"))
    ticks = getattr(reports, "ticks", len(reports))
    print(
        f"daemon exited after {ticks} ticks "
        f"({ran} of the retained {len(reports)} reports had due work)"
    )


if __name__ == "__main__":
    main()
