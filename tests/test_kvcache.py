"""DynamoDB-shaped conditional KV cache (state/kvcache.py) vs a faithful
fake store: conditional-write semantics, error mapping, STS renewal."""

import pytest

from grove_spark.state.kvcache import (
    CacheAccessError,
    ConstraintError,
    DynamoKVCache,
    NotFoundError,
)


class _ClientErr(Exception):
    def __init__(self, code):
        super().__init__(code)
        self.response = {"Error": {"Code": code}}


def fake_dynamo(expired_tokens=0):
    """A tiny DynamoDB: {(pk, sk): value} with real ConditionExpression
    evaluation for the two expressions the handler emits. The first
    ``expired_tokens`` data-plane calls fail with ExpiredToken."""
    tables = {}
    state = {"assumes": 0, "expired_left": expired_tokens, "calls": []}

    def check(tbl, key, params):
        cond = params.get("ConditionExpression")
        if cond is None:
            return
        if cond == "attribute_not_exists(#data)":
            if key in tbl:
                raise _ClientErr("ConditionalCheckFailedException")
        elif cond == "#data = :constraint":
            want = params["ExpressionAttributeValues"][":constraint"]["S"]
            if tbl.get(key) != want:
                raise _ClientErr("ConditionalCheckFailedException")
        else:  # pragma: no cover
            raise AssertionError(cond)

    def transport(action, params):
        state["calls"].append(action)
        if action == "sts.assume_role":
            state["assumes"] += 1
            return {"Credentials": {"AccessKeyId": f"AK{state['assumes']}"}}
        if state["expired_left"]:
            state["expired_left"] -= 1
            raise _ClientErr("ExpiredToken")
        tbl = tables.setdefault(params["TableName"], {})
        key = (params["Key"]["pk"]["S"], params["Key"]["sk"]["S"])
        if action == "get_item":
            if key not in tbl:
                return {}
            return {"Item": {"data": {"S": tbl[key]}}}
        if action == "update_item":
            check(tbl, key, params)
            assert params["UpdateExpression"] == "SET #data = :data"
            tbl[key] = params["ExpressionAttributeValues"][":data"]["S"]
            return {}
        if action == "delete_item":
            check(tbl, key, params)
            tbl.pop(key, None)
            return {}
        raise AssertionError(action)

    transport.tables = tables
    transport.state = state
    return transport


def test_get_set_delete_roundtrip_and_not_found():
    cache = DynamoKVCache(fake_dynamo())
    with pytest.raises(NotFoundError):
        cache.get("okta_system_log.corp", "pointer")
    cache.set("okta_system_log.corp", "pointer", "2024-01-01T00:00:00Z")
    assert cache.get("okta_system_log.corp", "pointer") == "2024-01-01T00:00:00Z"
    cache.delete("okta_system_log.corp", "pointer")
    with pytest.raises(NotFoundError):
        cache.get("okta_system_log.corp", "pointer")


def test_not_set_is_an_execution_lock():
    """aws_dynamodb.py:207: attribute_not_exists makes set() an acquire —
    exactly one of two racing workers wins; the loser's loss surfaces as
    ConstraintError (the ConcurrentCommitError analog)."""
    t = fake_dynamo()
    a, b = DynamoKVCache(t), DynamoKVCache(t)
    a.set("lock", "run", "worker-a", not_set=True)
    with pytest.raises(ConstraintError):
        b.set("lock", "run", "worker-b", not_set=True)
    assert b.get("lock", "run") == "worker-a"
    # release with the right constraint, then B acquires
    with pytest.raises(ConstraintError):
        a.delete("lock", "run", constraint="worker-b")
    a.delete("lock", "run", constraint="worker-a")
    b.set("lock", "run", "worker-b", not_set=True)
    assert b.get("lock", "run") == "worker-b"


def test_constraint_is_optimistic_cas():
    """:210: '#data = :constraint' — a stale reader's update loses."""
    t = fake_dynamo()
    cache = DynamoKVCache(t)
    cache.set("ref", "pointer", "100")
    cache.set("ref", "pointer", "200", constraint="100")
    with pytest.raises(ConstraintError):
        cache.set("ref", "pointer", "300", constraint="100")  # stale
    assert cache.get("ref", "pointer") == "200"


def test_not_set_and_constraint_is_a_value_error():
    cache = DynamoKVCache(fake_dynamo())
    with pytest.raises(ValueError, match="constraint AND not be set"):
        cache.set("a", "b", "v", not_set=True, constraint="x")


def test_expired_token_renews_once_then_fails():
    """:231-260 / :142-171: the first ExpiredToken triggers setup() and a
    retry; a second consecutive expiry is a loud access error."""
    t = fake_dynamo(expired_tokens=1)
    cache = DynamoKVCache(t, assume_role_arn="arn:aws:iam::1:role/c")
    assert cache.setup_count == 1
    cache.set("a", "b", "v")
    assert cache.setup_count == 2  # renewed mid-operation
    assert cache.get("a", "b") == "v"

    t2 = fake_dynamo(expired_tokens=2)
    c2 = DynamoKVCache(t2, assume_role_arn="arn:aws:iam::1:role/c")
    with pytest.raises(CacheAccessError):
        c2.set("a", "b", "v")


def test_non_conditional_store_errors_are_access_errors():
    def down(action, params):
        if action == "sts.assume_role":
            return {"Credentials": {}}
        raise ConnectionError("dynamo unreachable")

    cache = DynamoKVCache(down)
    with pytest.raises(CacheAccessError, match="Unable to get"):
        cache.get("a", "b")
    with pytest.raises(CacheAccessError, match="Unable to set"):
        cache.set("a", "b", "v")
    with pytest.raises(CacheAccessError, match="Unable to delete"):
        cache.delete("a", "b")
