"""Retention concurrency (VERDICT r4 #6 + ADVICE r4 medium):

* two retention passes from different hosts must not rewrite the same
  historical run files concurrently — the O_EXCL ``_retention.claim``
  lease admits one mutating pass at a time (dead owners reclaimed);
* the key-generation sweep must not delete a cross-host committer's
  in-flight generation files written between the sweep's two scans
  (claims precede generation writes, so a claims re-read AFTER the
  keys glob covers every generation the glob saw);
* claim age is measured in the filesystem's clock domain (probe-file
  mtime), so inter-host wall-clock skew cannot erode the lease.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import textwrap
import time

import pytest

import grove_spark.state.runstate as rs
from grove_spark.state.runstate import RunState


def _seed(root: str, n: int = 5) -> RunState:
    st = RunState(root)
    for i in range(n):
        st.commit("k", f"run-{i}", pointer=str(i), data_paths=[])
    return st


def test_live_peer_lease_skips_and_dead_peer_is_reclaimed(tmp_path):
    """A REAL second process holds the retention lease: the local pass
    returns ``skipped`` and mutates nothing; once that process dies the
    same-host pid check reclaims the lease and the pass proceeds."""
    root = str(tmp_path / "state")
    st = _seed(root)
    script = textwrap.dedent(f"""
        import sys, time
        sys.path.insert(0, {os.getcwd()!r})
        from grove_spark.state.runstate import RunState
        st = RunState({root!r})
        assert st._acquire_retention_lease()
        print("LEASED", flush=True)
        time.sleep(120)
    """)
    proc = subprocess.Popen(
        [sys.executable, "-c", script], stdout=subprocess.PIPE, text=True
    )
    try:
        assert proc.stdout.readline().strip() == "LEASED"
        out = st.expire_runs(keep_last=1)
        assert out.get("skipped"), out
        assert out["expired_records"] == 0
        # history untouched while skipped
        assert len(st._run_records()) == 5
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    # owner is provably dead now: lease reclaimed, pass runs
    out = st.expire_runs(keep_last=1)
    assert "skipped" not in out
    assert out["expired_records"] == 4
    # lease released after the pass
    assert not os.path.exists(os.path.join(root, "_retention.claim"))


def test_release_only_removes_own_lease(tmp_path):
    """A pass that stalls past the TTL can have its lease reclaimed by
    another host; its finally-block release must NOT delete the
    reclaimer's live lease (that would let a third pass run concurrently
    with the reclaimer — the exact race the lease exists to prevent)."""
    root = str(tmp_path / "state")
    st = _seed(root, 2)
    lease = os.path.join(root, "_retention.claim")
    # a foreign host owns the lease now (the reclaimer)
    with open(lease, "w") as f:
        json.dump({"host": "elsewhere", "pid": 1, "ts": time.time()}, f)
    st._release_retention_lease()
    assert os.path.exists(lease), "released a lease another host owns"
    os.remove(lease)
    # our own lease releases normally
    assert st._acquire_retention_lease()
    st._release_retention_lease()
    assert not os.path.exists(lease)


def test_cross_host_lease_respects_server_clock_ttl(tmp_path):
    root = str(tmp_path / "state")
    st = _seed(root, 3)
    lease = os.path.join(root, "_retention.claim")
    with open(lease, "w") as f:
        json.dump({"host": "elsewhere", "pid": 1, "ts": time.time()}, f)
    out = st.expire_runs(keep_last=1)
    assert out.get("skipped")
    # age the lease past the TTL in the FILESYSTEM clock domain
    old = time.time() - st.stale_claim_ttl_s - 60
    os.utime(lease, (old, old))
    out = st.expire_runs(keep_last=1)
    assert "skipped" not in out and out["expired_records"] == 2


def test_dry_run_needs_no_lease(tmp_path):
    root = str(tmp_path / "state")
    st = _seed(root, 3)
    lease = os.path.join(root, "_retention.claim")
    with open(lease, "w") as f:
        json.dump({"host": "elsewhere", "pid": 1, "ts": time.time()}, f)
    out = st.expire_runs(keep_last=1, dry_run=True)
    assert "skipped" not in out and out["expired_records"] == 2
    assert len(st._run_records()) == 3  # dry: nothing rewritten


def test_gen_sweep_spares_commit_claimed_between_scans(tmp_path, monkeypatch):
    """ADVICE r4 medium: a cross-host committer claims version v and
    writes its key generation files AFTER the sweep built its
    ``live_claims`` snapshot but BEFORE the keys glob. The post-glob
    claims re-read must protect those generations — deleting them would
    leave the committer's published root referencing missing files."""
    root = str(tmp_path / "state")
    st = _seed(root)
    v = st.version() + 1
    keys_pat = os.path.join(st._keys_dir, "*-*.json")
    gen_file = st._key_file("k", v)
    real_glob = rs._glob.glob
    fired = {"n": 0}

    def racing_glob(pattern):
        if pattern == keys_pat and fired["n"] == 0:
            fired["n"] = 1
            # the racing cross-host commit lands NOW: claim first (as
            # _commit_once does), then the generation file — both are
            # visible to this very glob / the claims re-read after it
            rs._atomic_write(
                st._run_file(v),
                {"records": [], "claim": {"host": "elsewhere", "pid": 1,
                                          "ts": time.time()}},
            )
            rs._atomic_write(gen_file, {"pointer": "p", "run_id": "race"})
        return real_glob(pattern)

    monkeypatch.setattr(rs._glob, "glob", racing_glob)
    st.expire_runs(keep_last=1)
    assert fired["n"] == 1
    assert os.path.exists(gen_file), (
        "in-flight cross-host generation deleted by the sweep"
    )
    # and the claim file survived too (live: fresh mtime)
    assert os.path.exists(st._run_file(v))


def test_server_clock_age_ignores_local_clock(tmp_path, monkeypatch):
    """Lease age comes from probe-mtime minus claim-mtime: skewing the
    LOCAL clock by hours must not change the measured age."""
    root = str(tmp_path / "state")
    st = RunState(root)
    p = os.path.join(root, "f")
    open(p, "w").close()
    age = st._server_clock_age(p)
    assert -2.0 <= age <= 5.0
    monkeypatch.setattr(rs.time, "time", lambda: time.monotonic() + 10**9)
    assert st._server_clock_age(p) <= 5.0  # unchanged by local skew
