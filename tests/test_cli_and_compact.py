"""CLI driver + tombstone compaction tests."""

import json
import os

from cwds_jobs_ray.cli import main as cli_main
from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.pipelines.oracle import replay
from cwds_jobs_ray.synth import WalSpec, synthesize


def test_cli_lifecycle(workdir, capsys):
    spec = WalSpec(seed=31, n_convs=10, turns_per_conv=3, n_events=60,
                   n_segments=3, frac_delete=0.3)
    d = synthesize(spec, workdir)
    table = os.path.join(workdir, "table")
    wal = os.path.join(workdir, "wal")

    assert cli_main(["status", "--table-dir", table]) == 0
    assert json.loads(capsys.readouterr().out)["job_mode"] == "INITIAL_LOAD"

    assert cli_main(["run", "--table-dir", table, "--wal-dir", wal,
                     "--base", d["base_path"], "--partitions", "4"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["job_mode"] == "INCREMENTAL_LOAD"
    assert out["applied_through_lsn"] == 60

    assert cli_main(["status", "--table-dir", table]) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["rows"] == out["rows"]


def test_cli_synth(workdir, capsys):
    out_dir = os.path.join(workdir, "synth")
    assert cli_main(["synth", "--out", out_dir, "--events", "100",
                     "--convs", "5", "--segments", "2"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["segments"] == 2
    assert os.path.exists(info["base"])


def test_compaction_drops_old_tombstones_only(workdir):
    spec = WalSpec(seed=32, n_convs=10, turns_per_conv=4, n_events=200,
                   n_segments=2, frac_delete=0.4)
    d = synthesize(spec, workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=10**9)
    m = job.run(base_path=d["base_path"])
    o = replay(d["base"], d["wal"], 4)

    import pyarrow.parquet as pq

    import pyarrow.compute as pc
    def tomb_count(manifest):
        n = 0
        for i in range(4):
            rel = manifest.part(i).file
            if not rel:
                continue
            t = pq.read_table(os.path.join(workdir, "table", rel))
            n += t.filter(pc.equal(t["op"], "D")).num_rows
        return n

    assert tomb_count(m) > 0
    # compact below half the lsn range: only old tombstones dropped
    m2 = job.compact(100)
    assert m2.table_version == m.table_version + 1
    # live table unchanged by compaction
    got = job.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)
    # full-horizon compaction removes all tombstones
    m3 = job.compact(10**9)
    assert tomb_count(m3) == 0
    assert job.read_table_arrow().select(o.final.column_names).equals(o.final)


def test_follow_mode_picks_up_new_segments(workdir):
    import threading
    import pyarrow.compute as pc
    from cwds_jobs_ray.synth import make_wal, write_wal_segments
    from cwds_jobs_ray.pipelines.oracle import replay
    import pyarrow as pa

    spec = WalSpec(seed=41, n_convs=8, turns_per_conv=3, n_events=40,
                   n_segments=2)
    d = synthesize(spec, workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=10**9)

    wal2 = make_wal(WalSpec(seed=42, n_convs=8, turns_per_conv=3, n_events=20,
                            n_segments=1))
    wal2 = wal2.set_column(wal2.schema.get_field_index("lsn"), "lsn",
                           pc.add(wal2["lsn"], 40))

    def land_later():
        import time
        time.sleep(1.0)
        write_wal_segments(wal2, os.path.join(workdir, "wal2"), 1)
        os.replace(os.path.join(workdir, "wal2", "segment-00000.parquet"),
                   os.path.join(workdir, "wal", "segment-00050.parquet"))

    t = threading.Thread(target=land_later)
    t.start()
    m = job.follow(base_path=d["base_path"], poll_interval_s=0.5,
                   idle_polls_to_stop=4)
    t.join()
    assert m.applied_through_lsn == 60  # second wave applied by the tail
    o = replay(d["base"], pa.concat_tables([d["wal"], wal2]), 4)
    got = job.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)


def test_cli_export(workdir, capsys):
    spec = WalSpec(seed=61, n_convs=6, turns_per_conv=2, n_events=30,
                   n_segments=1)
    d = synthesize(spec, workdir)
    table = os.path.join(workdir, "table")
    assert cli_main(["run", "--table-dir", table,
                     "--wal-dir", os.path.join(workdir, "wal"),
                     "--base", d["base_path"], "--partitions", "4"]) == 0
    run_out = json.loads(capsys.readouterr().out)
    out_dir = os.path.join(workdir, "export")
    assert cli_main(["export", "--table-dir", table, "--out", out_dir]) == 0
    exp = json.loads(capsys.readouterr().out)
    assert exp["rows"] == run_out["rows"]
    import pyarrow.dataset as pads
    t = pads.dataset(out_dir).to_table()
    assert t.num_rows == run_out["rows"]
    assert "op" not in t.column_names  # public columns only


def test_yaml_config_env_substitution_and_validation(workdir, monkeypatch):
    from cwds_jobs_ray.config import ConfigError, load_config

    cfg_path = os.path.join(workdir, "job.yaml")
    monkeypatch.setenv("MY_WAL", "/data/wal")
    with open(cfg_path, "w") as f:
        f.write(
            "table_dir: ${MY_TABLE:-/data/table}\n"
            "wal_dir: ${MY_WAL}\n"
            "num_partitions: '8'\n"          # string from env-style usage
            "delta_threshold: 0.5\n"
            "merge_policy: fww\n")
    cfg = load_config(cfg_path)
    assert cfg["table_dir"] == "/data/table"   # ${VAR:-default} fallback
    assert cfg["wal_dir"] == "/data/wal"       # ${VAR} from env
    assert cfg["num_partitions"] == 8          # coerced int
    assert cfg["delta_threshold"] == 0.5
    assert cfg["merge_policy"] == "fww"

    import pytest as _pytest
    with open(cfg_path, "w") as f:
        f.write("table_dir: /t\nwal_dir: /w\nbogus_key: 1\n")
    with _pytest.raises(ConfigError, match="unknown config key"):
        load_config(cfg_path)
    with open(cfg_path, "w") as f:
        f.write("table_dir: /t\n")  # neither wal_dir nor wal_sources
    with _pytest.raises(ConfigError, match="wal_dir / wal_sources"):
        load_config(cfg_path)
    with open(cfg_path, "w") as f:  # required key truly missing
        f.write("wal_dir: /w\n")
    with _pytest.raises(ConfigError, match="missing required"):
        load_config(cfg_path)
    with open(cfg_path, "w") as f:
        f.write("table_dir: /t\nwal_dir: ${UNSET_VAR_XYZ}\n")
    with _pytest.raises(ConfigError, match="UNSET_VAR_XYZ"):
        load_config(cfg_path)


def test_cli_run_from_config_file(workdir, capsys, monkeypatch):
    """Reference pattern: job fully driven by `-c config.yaml` with ${ENV}
    substitution (JobConfiguration.java:27-48)."""
    spec = WalSpec(seed=71, n_convs=6, turns_per_conv=2, n_events=40,
                   n_segments=2, dup_redelivery_frac=0.1)
    d = synthesize(spec, workdir)
    monkeypatch.setenv("CDC_TABLE_DIR", os.path.join(workdir, "table"))
    cfg_path = os.path.join(workdir, "job.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            "table_dir: ${CDC_TABLE_DIR}\n"
            f"wal_dir: {os.path.join(workdir, 'wal')}\n"
            f"base_path: {d['base_path']}\n"
            "num_partitions: 4\n"
            "events_per_batch: 20\n")
    assert cli_main(["run", "-c", cfg_path]) == 0
    out = json.loads(capsys.readouterr().out)
    o = replay(d["base"], d["wal"], 4)
    assert out["rows"] == o.rows_applied
    assert out["applied_through_lsn"] == 40


def test_cli_verify_subcommand(workdir, capsys):
    spec = WalSpec(seed=63, n_convs=4, turns_per_conv=2, n_events=20,
                   n_segments=1)
    d = synthesize(spec, workdir)
    table = os.path.join(workdir, "table")
    assert cli_main(["run", "--table-dir", table,
                     "--wal-dir", os.path.join(workdir, "wal"),
                     "--base", d["base_path"], "--partitions", "2"]) == 0
    capsys.readouterr()
    assert cli_main(["verify", "--table-dir", table]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] and out["files"] >= 1


def test_cli_flag_overrides_config_wal_sources(workdir, capsys):
    """--wal-dir with a config that declares wal_sources must follow the
    documented flags-override-config precedence (the flag replaces the
    config's WAL source) instead of tripping the exactly-one check."""
    spec = WalSpec(seed=77, n_convs=4, turns_per_conv=2, n_events=20,
                   n_segments=1)
    d = synthesize(spec, workdir)
    cfg_path = os.path.join(workdir, "job.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            f"table_dir: {os.path.join(workdir, 'table')}\n"
            f"base_path: {d['base_path']}\n"
            "num_partitions: 2\n"
            "wal_sources:\n"
            "  bogus: /nonexistent\n")
    assert cli_main(["run", "-c", cfg_path,
                     "--wal-dir", os.path.join(workdir, "wal")]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["applied_through_lsn"] == 20  # the flag's WAL was used


def test_cli_follow_knobs_without_optin_run_one_shot(workdir, capsys):
    """A follow: section holding only tuning knobs must NOT force tail mode;
    follow requires --follow or follow.enabled."""
    spec = WalSpec(seed=78, n_convs=4, turns_per_conv=2, n_events=20,
                   n_segments=1)
    d = synthesize(spec, workdir)
    cfg_path = os.path.join(workdir, "job.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            f"table_dir: {os.path.join(workdir, 'table')}\n"
            f"wal_dir: {os.path.join(workdir, 'wal')}\n"
            f"base_path: {d['base_path']}\n"
            "num_partitions: 2\n"
            "follow:\n"
            "  poll_interval_s: 0.1\n"
            "  idle_polls_to_stop: 1\n")
    # one-shot: returns immediately without tailing (idle_polls_to_stop=1
    # would also terminate a tail, so assert via the config path: enabled
    # flag present -> follow; absent -> plain run with same result)
    assert cli_main(["run", "-c", cfg_path]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["applied_through_lsn"] == 20
    o = replay(d["base"], d["wal"], 2)
    assert out["rows"] == o.rows_applied


def test_finalizer_chain_order_and_failure_isolation(workdir):
    """Composable finalizers (the reference's primary savepoint promotion +
    secondary publish chain): run in order; a failing finalizer propagates
    without undoing earlier finalizers' committed effects or running later
    ones; the drained batches stay committed."""
    import pytest
    from cwds_jobs_ray.pipelines.cdc import (CDCJob, make_export_finalizer,
                                             promote_to_incremental)
    from cwds_jobs_ray.state.manifest import INCREMENTAL_LOAD, Manifest

    spec = WalSpec(seed=91, n_convs=5, turns_per_conv=2, n_events=30,
                   n_segments=2)
    d = synthesize(spec, workdir)
    table = os.path.join(workdir, "table")
    calls = []

    def boom(job, manifest):
        calls.append("boom")
        raise RuntimeError("secondary publish failed")

    def never(job, manifest):
        calls.append("never")
        return manifest

    def tracked_promote(job, manifest):
        calls.append("promote")
        return promote_to_incremental(job, manifest)

    job = CDCJob(table, os.path.join(workdir, "wal"), num_partitions=2,
                 finalizers=[tracked_promote, boom, never])
    with pytest.raises(RuntimeError, match="secondary publish failed"):
        job.run(base_path=d["base_path"])
    assert calls == ["promote", "boom"]  # order kept; later ones skipped
    # the primary finalizer's committed effect survived the failure
    m = Manifest.load(table)
    assert m.job_mode == INCREMENTAL_LOAD
    assert m.applied_through_lsn == 30  # drained batches stayed committed

    # a secondary export finalizer actually publishes the live table
    out_dir = os.path.join(workdir, "published")
    job2 = CDCJob(table, os.path.join(workdir, "wal"), num_partitions=2,
                  finalizers=[promote_to_incremental,
                              make_export_finalizer(out_dir)])
    job2.apply_wal()
    import pyarrow.dataset as pads
    o = replay(d["base"], d["wal"], 2)
    assert pads.dataset(out_dir).to_table().num_rows == o.rows_applied


def test_cli_vacuum_and_versioned_export(workdir, capsys):
    spec = WalSpec(seed=35, n_convs=10, turns_per_conv=3, n_events=90,
                   n_segments=3)
    d = synthesize(spec, workdir)
    table = os.path.join(workdir, "table")
    assert cli_main(["run", "--table-dir", table,
                     "--wal-dir", os.path.join(workdir, "wal"),
                     "--base", d["base_path"], "--partitions", "4",
                     "--events-per-batch", "30"]) == 0
    capsys.readouterr()

    assert cli_main(["status", "--table-dir", table]) == 0
    st = json.loads(capsys.readouterr().out)
    assert len(st["retained_versions"]) >= 2

    old = st["retained_versions"][-2]
    out_dir = os.path.join(workdir, "export_old")
    assert cli_main(["export", "--table-dir", table, "--out", out_dir,
                     "--version", str(old)]) == 0
    exp = json.loads(capsys.readouterr().out)
    assert exp["version"] == old and exp["rows"] > 0

    assert cli_main(["vacuum", "--table-dir", table,
                     "--keep-last", "1"]) == 0
    vc = json.loads(capsys.readouterr().out)
    assert old in vc["dropped_versions"]
    assert cli_main(["status", "--table-dir", table]) == 0
    st2 = json.loads(capsys.readouterr().out)
    assert len(st2["retained_versions"]) == 1


def test_cli_changes_lookup_view(workdir, capsys):
    spec = WalSpec(seed=47, n_convs=12, turns_per_conv=3, n_events=120,
                   n_segments=4)
    d = synthesize(spec, workdir)
    table = os.path.join(workdir, "table")
    wal = os.path.join(workdir, "wal")
    job = CDCJob(table, wal, num_partitions=4, events_per_batch=40)
    job.run(base_path=d["base_path"])
    from cwds_jobs_ray.state.manifest import Manifest

    versions = Manifest.retained_versions(table)
    va = min(v for v in versions if v >= 1)

    assert cli_main(["changes", "--table-dir", table,
                     "--from-version", str(va)]) == 0
    ch = json.loads(capsys.readouterr().out)["changes"]
    assert sum(ch.values()) > 0 and set(ch) <= {"I", "U", "D"}

    out_dir = os.path.join(workdir, "feed_out")
    assert cli_main(["changes", "--table-dir", table,
                     "--from-version", str(va), "--out", out_dir]) == 0
    assert json.loads(capsys.readouterr().out)["rows"] == sum(ch.values())

    conv = job.read_table_arrow()["conv_id"][0].as_py()
    assert cli_main(["lookup", "--table-dir", table,
                     "--conv-id", conv]) == 0
    lk = json.loads(capsys.readouterr().out)
    assert lk["rows"] == len(lk["turns"]) > 0

    assert cli_main(["view", "--table-dir", table]) == 0
    vw = json.loads(capsys.readouterr().out)
    assert vw["rows"] > 0
    assert cli_main(["view", "--table-dir", table]) == 0  # refresh no-op
    assert json.loads(capsys.readouterr().out) == vw
