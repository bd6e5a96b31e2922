"""DynamoDB-shaped conditional KV cache — the wire adapter for the
reference's cache backend (grove/caches/aws_dynamodb.py:63-320).

The SEMANTICS this backend exists for — conditional writes as an
execution lock / optimistic concurrency — are already implemented
natively by the run-state manifest's O_EXCL claim protocol
(state/runstate.py, with a real two-process race test); this module is
the missing wire ADAPTER for fleets whose pointer cache is an actual
DynamoDB table. Wire shape rides the same injected ``transport(action,
params) -> dict`` the SSM providers and S3ObjectOutput use (config.py,
operators/sinks.py): no AWS in this sandbox, and in production the
transport wraps boto3 without this module knowing.

Reference-parity contract (cited lines are /root/reference paths):

* ``get(pk, sk)`` — ``get_item`` on the ``{pk, sk}`` key, returning
  ``Item.data.S``; a missing item raises ``NotFoundError``
  (aws_dynamodb.py:132-175's KeyError -> NotFoundException path);
* ``set(pk, sk, value, not_set=, constraint=)`` — ``update_item`` with
  ``SET #data = :data``; ``not_set=True`` adds
  ``attribute_not_exists(#data)`` and a ``constraint`` adds
  ``#data = :constraint`` (:177-263). Both together is a ValueError.
  A ``ConditionalCheckFailedException`` from the store raises
  ``ConstraintError`` — the optimistic-lock loss signal callers treat
  exactly like runstate's ConcurrentCommitError;
* ``delete(pk, sk, constraint=)`` — ``delete_item``, same constraint
  and error mapping (:264-320);
* every operation retries ONCE on ``ExpiredToken`` after re-running
  ``setup()`` (the STS renewal dance, :81-130 via setup), matching
  S3ObjectOutput; any other store error raises ``CacheAccessError``.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional

log = logging.getLogger(__name__)


class NotFoundError(KeyError):
    """No value in the cache for (pk, sk)."""


class ConstraintError(RuntimeError):
    """A conditional write's condition failed — another worker won the
    race (the reference's DataFormatException on
    ConditionalCheckFailedException)."""


class CacheAccessError(RuntimeError):
    """The store could not be reached / the operation failed."""


def _error_code(err: Exception) -> str:
    return getattr(err, "response", {}).get("Error", {}).get("Code", "")


class DynamoKVCache:
    """See module docstring. ``table`` defaults to the reference's
    default table name."""

    def __init__(
        self,
        transport: Callable[[str, dict], dict],
        table: str = "grove",
        table_region: Optional[str] = None,
        assume_role_arn: Optional[str] = None,
    ):
        self.transport = transport
        self.table = table
        self.table_region = table_region
        self.assume_role_arn = assume_role_arn
        self.credentials: Optional[dict] = None
        self.setup_count = 0
        self.setup()

    def setup(self) -> None:
        self.setup_count += 1
        if not self.assume_role_arn:
            return
        try:
            role = self.transport(
                "sts.assume_role",
                {
                    "RoleArn": self.assume_role_arn,
                    "RoleSessionName": "GroveCacheHandler",
                    "_region": self.table_region,
                },
            )
            self.credentials = role["Credentials"]
        except Exception as err:
            raise CacheAccessError(
                f"Cache handler is unable to access AWS DynamoDB: {err}"
            ) from err

    def _call(self, action: str, params: dict) -> dict:
        params = {
            **params,
            "TableName": self.table,
            "Credentials": self.credentials,
            "_region": self.table_region,
        }
        return self.transport(action, params)

    def get(self, pk: str, sk: str) -> str:
        for tries in range(2):
            try:
                response = self._call(
                    "get_item",
                    {"Key": {"pk": {"S": pk}, "sk": {"S": sk}}},
                )
            except Exception as err:
                if _error_code(err) == "ExpiredToken" and tries == 0:
                    log.warning("AWS session expired, requesting a new one")
                    self.setup()
                    continue
                raise CacheAccessError(
                    f"Unable to get value from cache. {err}"
                ) from err
            try:
                return str(response["Item"]["data"]["S"])
            except (KeyError, TypeError):
                raise NotFoundError((pk, sk)) from None
        raise AssertionError("unreachable: the retry loop returns or raises")

    def set(
        self,
        pk: str,
        sk: str,
        value: str,
        not_set: bool = False,
        constraint: Optional[str] = None,
    ) -> None:
        if not_set and constraint is not None:
            raise ValueError(
                "A value cannot both have a constraint AND not be set."
            )
        options: Dict[str, Any] = {
            "ExpressionAttributeValues": {":data": {"S": str(value)}}
        }
        if not_set:
            options["ConditionExpression"] = "attribute_not_exists(#data)"
        if constraint is not None:
            options["ConditionExpression"] = "#data = :constraint"
            options["ExpressionAttributeValues"][":constraint"] = {
                "S": str(constraint)
            }
        for tries in range(2):
            try:
                self._call(
                    "update_item",
                    {
                        "Key": {"pk": {"S": str(pk)}, "sk": {"S": str(sk)}},
                        "UpdateExpression": "SET #data = :data",
                        "ExpressionAttributeNames": {"#data": "data"},
                        **options,
                    },
                )
                return
            except Exception as err:
                code = _error_code(err)
                if code == "ConditionalCheckFailedException":
                    raise ConstraintError(
                        f"Cache set failed as constraint failed "
                        f"(pk={pk!r}, sk={sk!r}, not_set={not_set}, "
                        f"constraint={constraint!r})"
                    ) from err
                if code == "ExpiredToken" and tries == 0:
                    log.warning("AWS session expired, requesting a new one")
                    self.setup()
                    continue
                raise CacheAccessError(
                    f"Unable to set value in cache: {err}"
                ) from err

    def delete(self, pk: str, sk: str, constraint: Optional[str] = None) -> None:
        options: Dict[str, Any] = {}
        if constraint is not None:
            options["ConditionExpression"] = "#data = :constraint"
            options["ExpressionAttributeNames"] = {"#data": "data"}
            options["ExpressionAttributeValues"] = {
                ":constraint": {"S": str(constraint)}
            }
        for tries in range(2):
            try:
                self._call(
                    "delete_item",
                    {"Key": {"pk": {"S": pk}, "sk": {"S": sk}}, **options},
                )
                return
            except Exception as err:
                code = _error_code(err)
                if code == "ConditionalCheckFailedException":
                    raise ConstraintError(
                        f"Cache delete failed as constraint failed "
                        f"(pk={pk!r}, sk={sk!r}, constraint={constraint!r})"
                    ) from err
                if code == "ExpiredToken" and tries == 0:
                    log.warning("AWS session expired, requesting a new one")
                    self.setup()
                    continue
                raise CacheAccessError(
                    f"Unable to delete value from cache: {err}"
                ) from err
