"""spark-submit entry point for the grove_spark pipeline.

Cluster deployment (the north_rule's shape):

    zip -r grove_spark.zip grove_spark
    spark-submit --py-files grove_spark.zip jobs/run_pipeline.py \
        --sequences s3a://bucket/sequences --configs ./configs \
        --state s3a://bucket/_grove_state --out s3a://bucket/routed

Sandbox smoke (local mode):

    spark-submit jobs/run_pipeline.py --fixture-rows 1000 --out /tmp/out

One invocation = one scheduler tick: load configs -> hydrate secrets ->
run every due connector as ONE fleet plan -> write partitioned sinks ->
commit pointers + per-sink metrics in the shared manifest. Rerunning is
idempotent (exactly-once via manifest lineage).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sequences", help="path to the sequences table (parquet/Iceberg)")
    p.add_argument("--configs", help="directory of Grove-style connector config JSON docs")
    p.add_argument("--state", help="run-state directory (manifest)", default=None)
    p.add_argument("--out", help="sink root for partitioned writes", default=None)
    p.add_argument("--fixture-rows", type=int, default=0,
                   help="smoke mode: synthesize a fixture of N rows instead of --sequences/--configs")
    p.add_argument("--master", default=None, help="override master (else spark-submit's)")
    args = p.parse_args()

    from grove_spark.config import (
        env_secrets_provider,
        hydrate_secrets,
        load_configs,
        run_fleet,
    )
    from grove_spark.session import get_spark
    from grove_spark.state.runstate import RunState

    spark = get_spark("grove_spark_pipeline", master=args.master)

    if args.fixture_rows:
        from grove_spark.fixtures.generator import SOURCE_NAMES, write_fixture

        d = tempfile.mkdtemp(prefix="grove_smoke_")
        paths = write_fixture(d, args.fixture_rows)
        sequences = paths["sequences"]
        cfg_dir = os.path.join(d, "configs")
        os.makedirs(cfg_dir)
        for s in SOURCE_NAMES[:4]:
            with open(os.path.join(cfg_dir, f"{s}.json"), "w") as f:
                json.dump({"connector": f"{s}_audit_events",
                           "identity": f"{s}.example.org", "source": s}, f)
    else:
        if not (args.sequences and args.configs):
            p.error("--sequences and --configs required (or --fixture-rows)")
        sequences, cfg_dir = args.sequences, args.configs

    configs = hydrate_secrets(load_configs(cfg_dir), env_secrets_provider)
    state = RunState(args.state or tempfile.mkdtemp(prefix="grove_state_"))
    result = run_fleet(spark, configs, sequences, state, out_path=args.out)
    print(json.dumps({
        "due": result["due"],
        "run_id": result.get("run_id"),
        "per_connector": result.get("per_connector", {}),
        "committed_paths": state.committed_paths(),
    }, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
