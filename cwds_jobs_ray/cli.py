"""CLI entrypoint — the descendant of the reference's job runners
(`CwsFacilityJobRunner.main` + JobOptions parsing,
/root/reference/jobs-facilities-cws/src/main/java/gov/ca/cwds/jobs/cals/facility/cws/CwsFacilityJobRunner.java:10-14,
/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/configuration/JobOptions.java:132-165).

Run locally or via `ray job submit -- python -m cwds_jobs_ray.cli run ...`.
Each scheduled invocation resolves its mode from the manifest and drains the
WAL, exactly like the reference's cron-driven batch jobs (README.md:3).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cwds-jobs-ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="resolve job mode and drain the WAL")
    run.add_argument("-c", "--config", default=None,
                     help="YAML job config with ${ENV} substitution "
                          "(flags override config values)")
    run.add_argument("--table-dir", default=None)
    run.add_argument("--wal-dir", default=None)
    run.add_argument("--base", default=None,
                     help="base snapshot parquet (initial load only)")
    run.add_argument("--partitions", type=int, default=None)
    run.add_argument("--events-per-batch", type=int, default=None)
    run.add_argument("--follow", action="store_true",
                     help="keep tailing the WAL for new segments")
    run.add_argument("--poll-interval", type=float, default=None)
    run.add_argument("--idle-polls-to-stop", type=int, default=None)

    st = sub.add_parser("status", help="print the committed manifest")
    st.add_argument("--table-dir", required=True)

    cp = sub.add_parser("compact", help="drop tombstones older than a horizon")
    cp.add_argument("--table-dir", required=True)
    cp.add_argument("--tombstone-horizon-lsn", type=int, required=True)

    vf = sub.add_parser("verify", help="check committed files against the "
                                       "manifest (verify-on-open sentinel)")
    vf.add_argument("--table-dir", required=True)

    rs = sub.add_parser("reshard", help="change the table's partition count")
    rs.add_argument("--table-dir", required=True)
    rs.add_argument("--partitions", type=int, required=True)

    ex = sub.add_parser("export", help="write the live table as sorted parquet")
    ex.add_argument("--table-dir", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--version", type=int, default=None,
                    help="time travel: export a retained committed version")

    vc = sub.add_parser("vacuum", help="drop old version snapshots and "
                                       "reclaim unreferenced data files")
    vc.add_argument("--table-dir", required=True)
    vc.add_argument("--keep-last", type=int, default=2)

    ch = sub.add_parser("changes", help="change data feed between two "
                                        "retained versions (I/U/D rows with "
                                        "before-images)")
    ch.add_argument("--table-dir", required=True)
    ch.add_argument("--from-version", type=int, required=True)
    ch.add_argument("--to-version", type=int, default=None)
    ch.add_argument("--out", default=None,
                    help="write the feed as parquet; default prints counts")

    lk = sub.add_parser("lookup", help="point query: one conversation's "
                                       "live turns")
    lk.add_argument("--table-dir", required=True)
    lk.add_argument("--conv-id", required=True)
    lk.add_argument("--version", type=int, default=None)

    vw = sub.add_parser("view", help="build or incrementally refresh the "
                                     "conv_stats materialized view")
    vw.add_argument("--table-dir", required=True)
    vw.add_argument("--rebuild", action="store_true",
                    help="force a full rebuild instead of a feed refresh")

    sy = sub.add_parser("synth", help="generate a deterministic workload")
    sy.add_argument("--out", required=True)
    sy.add_argument("--events", type=int, default=10_000)
    sy.add_argument("--convs", type=int, default=100)
    sy.add_argument("--segments", type=int, default=8)
    sy.add_argument("--seed", type=int, default=42)

    args = p.parse_args(argv)

    if args.cmd == "synth":  # no Ray needed
        from .synth import WalSpec, synthesize

        spec = WalSpec(seed=args.seed, n_convs=args.convs,
                       n_events=args.events, n_segments=args.segments)
        out = synthesize(spec, args.out)
        print(json.dumps({"base": out["base_path"],
                          "segments": len(out["segments"])}))
        return 0

    if args.cmd == "status":
        from .state.manifest import Manifest

        m = Manifest.load(args.table_dir)
        if m is None:
            print(json.dumps({"job_mode": "INITIAL_LOAD", "manifest": None}))
            return 0
        print(json.dumps({
            "job_mode": m.job_mode,
            "table_version": m.table_version,
            "schema_version": m.schema_version,
            "num_partitions": m.num_partitions,
            "applied_through_lsn": m.applied_through_lsn,
            "rows": m.total("rows_applied"),
            "dedup": m.total("dedup_count"),
            "conflicts": m.total("conflict_count"),
            "replay_skipped": m.total("replay_skipped"),
            "sources": m.sources,  # multi-source composite savepoints
            "source_namespaces": m.source_namespaces,
            "retained_versions": Manifest.retained_versions(args.table_dir),
            "recent_batches": m.batch_history[-5:],
        }))
        return 0

    import ray

    if not ray.is_initialized():  # driver contract: never re-init
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from .pipelines.cdc import CDCJob

    if args.cmd == "run":
        from .config import job_from_config, load_config

        # precedence: explicit flag > config file > built-in default — flags
        # merge into the raw config BEFORE validation (load_config), so the
        # wal_dir/wal_sources exclusivity check sees the effective config
        overrides = {
            "table_dir": args.table_dir,
            "wal_dir": args.wal_dir,
            "num_partitions": args.partitions,
            "events_per_batch": args.events_per_batch,
        }
        if args.config:
            cfg = load_config(args.config, overrides=overrides)
        else:
            cfg = {k: v for k, v in overrides.items() if v is not None}
        if not cfg.get("table_dir"):
            p.error("table_dir required (flag or config file)")
        if not cfg.get("wal_dir") and not cfg.get("wal_sources"):
            p.error("wal_dir or wal_sources required (flag or config file)")
        job = job_from_config(cfg)
        base = args.base or cfg.get("base_path") or None
        fcfg = cfg.get("follow", {})
        # tail mode only on explicit opt-in (--follow or follow.enabled);
        # a follow: section holding tuning knobs alone doesn't force it
        if args.follow or fcfg.get("enabled"):
            m = job.follow(
                base_path=base,
                poll_interval_s=args.poll_interval
                if args.poll_interval is not None
                else fcfg.get("poll_interval_s", 2.0),
                idle_polls_to_stop=args.idle_polls_to_stop
                if args.idle_polls_to_stop is not None
                else fcfg.get("idle_polls_to_stop"),
                max_polls=fcfg.get("max_polls"),
            )
        else:
            m = job.run(base_path=base)
        print(json.dumps({"job_mode": m.job_mode,
                          "table_version": m.table_version,
                          "applied_through_lsn": m.applied_through_lsn,
                          "rows": m.total("rows_applied")}))
        return 0

    if args.cmd == "export":
        job = CDCJob(args.table_dir, wal_dir="/nonexistent")
        ds = job.read_table(version=args.version)
        # per-partition files are already (conv_id, turn_idx)-sorted;
        # exported files keep that order (one file per committed partition)
        ds.write_parquet(args.out)
        print(json.dumps({"rows": ds.count(), "out": args.out,
                          "version": args.version}))
        return 0

    if args.cmd == "vacuum":
        job = CDCJob(args.table_dir, wal_dir="/nonexistent")
        dropped, removed = job.vacuum(keep_last=args.keep_last)
        print(json.dumps({"dropped_versions": dropped,
                          "removed_files": removed}))
        return 0

    if args.cmd == "verify":
        job = CDCJob(args.table_dir, wal_dir="/nonexistent")
        m = job.verify_committed_files()
        print(json.dumps({"ok": True, "files": len(m.committed_files()),
                          "table_version": m.table_version}))
        return 0

    if args.cmd == "reshard":
        job = CDCJob(args.table_dir, wal_dir="/nonexistent")
        m = job.reshard(args.partitions)
        print(json.dumps({"table_version": m.table_version,
                          "num_partitions": m.num_partitions,
                          "rows": m.total("rows_applied")}))
        return 0

    if args.cmd == "changes":
        job = CDCJob(args.table_dir, wal_dir="/nonexistent")
        ds = job.read_changes(args.from_version, args.to_version)
        if args.out:
            ds.write_parquet(args.out)
            print(json.dumps({"rows": ds.count(), "out": args.out}))
        else:
            import collections

            import numpy as np
            counts: collections.Counter = collections.Counter()
            for b in ds.iter_batches(batch_format="pyarrow"):
                vals, ns = np.unique(
                    b["change_type"].to_numpy(zero_copy_only=False),
                    return_counts=True)
                counts.update(dict(zip(vals.tolist(), ns.tolist())))
            print(json.dumps({"changes": dict(counts)}))
        return 0

    if args.cmd == "lookup":
        job = CDCJob(args.table_dir, wal_dir="/nonexistent")
        t = job.lookup(args.conv_id, version=args.version)
        print(json.dumps({"conv_id": args.conv_id, "rows": t.num_rows,
                          "turns": t["turn_idx"].to_pylist()
                          if t.num_rows else []}))
        return 0

    if args.cmd == "view":
        from .pipelines.views import ConvStatsView

        view = ConvStatsView(CDCJob(args.table_dir, wal_dir="/nonexistent"))
        st = view.full_build() if args.rebuild else view.refresh()
        print(json.dumps({"applied_version": st["applied_version"],
                          "rows": view.read().num_rows}))
        return 0

    if args.cmd == "compact":
        # compaction only touches table_dir; no WAL involved
        job = CDCJob(args.table_dir, wal_dir="/nonexistent")
        m = job.compact(args.tombstone_horizon_lsn)
        print(json.dumps({"table_version": m.table_version,
                          "rows": m.total("rows_applied")}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
