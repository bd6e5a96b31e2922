"""Cross-driver conditional commit (VERDICT r3 #6): the flock only
serializes committers on ONE host; two drivers sharing a state dir over
NFS never see each other's advisory locks. The run record at the target
version is claimed with O_CREAT|O_EXCL — the filesystem's native
conditional write (the analog of the reference's DynamoDB
ConditionExpression put, grove/caches/aws_dynamodb.py:24-57) — so
exactly one driver can own a version.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

import grove_spark.state.runstate as rs
from grove_spark.state.runstate import ConcurrentCommitError, RunState

K = 25


def test_two_process_race_loses_no_update(tmp_path, monkeypatch):
    """Two REAL processes hammer unconditional commits on one state dir
    with advisory locks disabled (what NFS looks like across hosts):
    every commit must land — 2K versions, 2K run records, no lost
    updates, no interleaved corruption."""
    root = str(tmp_path / "state")
    RunState(root)  # layout
    script = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {os.getcwd()!r})
        import grove_spark.state.runstate as rs
        rs.fcntl = None  # cross-host: flock invisible to the peer
        st = rs.RunState({root!r})
        for i in range({K}):
            st.commit("sub_key", f"sub-{{i}}", pointer=str(i))
        print("SUBPROC_DONE")
    """)
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    monkeypatch.setattr(rs, "fcntl", None)
    st = RunState(root)
    for i in range(K):
        st.commit("main_key", f"main-{i}", pointer=str(i))
    out, err = proc.communicate(timeout=120)
    assert "SUBPROC_DONE" in out, f"subprocess failed: {err[-2000:]}"

    st2 = RunState(root)
    assert st2.version() == 2 * K, "a version was lost or double-claimed"
    run_ids = [h["run_id"] for h in st2._run_records()]
    assert len(run_ids) == 2 * K and len(set(run_ids)) == 2 * K
    assert {f"sub-{i}" for i in range(K)} <= set(run_ids)
    assert {f"main-{i}" for i in range(K)} <= set(run_ids)
    # both final pointers are each writer's last value
    assert st2.pointer("sub_key") == str(K - 1)
    assert st2.pointer("main_key") == str(K - 1)


def test_conditional_commit_exactly_one_winner(tmp_path):
    """An in-flight peer claim makes a conditional commit LOSE loudly
    (the two-driver outcome: one winner, one ConcurrentCommitError)."""
    st = RunState(str(tmp_path / "state"))
    st.commit("k", "r1", pointer="1")
    v = st.version()
    # peer driver claims v+1 (it read the same version we did)
    peer = os.path.join(st.root, "runs", f"{v + 1:012d}.json")
    with open(peer, "x") as f:
        json.dump({"records": [{"run_id": "peer", "key": "k",
                                "pointer": "P", "metrics": {},
                                "data_paths": []}]}, f)
    with pytest.raises(ConcurrentCommitError, match="claimed"):
        st.commit("k", "r2", pointer="2", expected_version=v)
    # the peer's claim is invisible until IT publishes
    assert st.pointer("k") == "1" and not st.is_committed("peer")


def test_stale_claim_is_reclaimed_after_ttl(tmp_path):
    """A claim whose owner crashed before publishing (root never
    advanced) is reclaimed once older than the lease TTL — the DynamoDB
    lease-expiry analog — and blocks before that."""
    st = RunState(str(tmp_path / "state"))
    st.commit("k", "r1", pointer="1")
    v = st.version()
    claim = os.path.join(st.root, "runs", f"{v + 1:012d}.json")
    with open(claim, "x") as f:
        json.dump({"records": []}, f)
    # young claim: conditional commit conflicts
    with pytest.raises(ConcurrentCommitError):
        st.commit("k", "rX", pointer="9", expected_version=v)
    # age it past the TTL -> reclaimed, commit goes through
    t = os.path.getmtime(claim) - (st.stale_claim_ttl_s + 10)
    os.utime(claim, (t, t))
    st.commit("k", "r2", pointer="2", expected_version=v)
    assert st.version() == v + 1 and st.pointer("k") == "2"
    with open(claim) as f:
        assert [r["run_id"] for r in json.load(f)["records"]] == ["r2"]
