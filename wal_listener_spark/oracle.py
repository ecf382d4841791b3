"""Pure-Python sequential oracle for trace replay.

Applies change events one at a time in ``(lsn, tx_id, seq)`` order to a
dict keyed on ``(repo, path)`` — exactly the semantics the reference gets
from single-threaded socket consumption
(``/root/reference/internal/listener/listener.go:364-386`` poll loop,
``listener.go:388-436`` per-commit apply). Used by pytest to validate the
distributed Spark apply (which must reach the same final state despite
partitioning).

TOAST 'u' cells preserve the prior value (``parser.go:335-336``): the
oracle keeps the existing column when it is listed in ``toast_cols``.
TRUNCATE clears the table (``parser.go:212-225`` fans out one action per
relation).
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable


def apply_trace(rows: Iterable[dict[str, Any]]) -> dict[tuple[str, str], dict]:
    """rows: columnar trace dicts (op/lsn/seq/old_vals/new_vals/toast_cols).

    Returns final state {(repo, path): {col: value}}. Values stay text —
    typed casting is checked separately (the cast matrix tests).
    """
    ordered = sorted(
        rows, key=lambda r: (r["lsn"], r.get("tx_id") or 0, r.get("seq") or 0)
    )
    state: dict[tuple[str, str], dict] = {}
    for r in ordered:
        op = r["op"]
        if op in ("B", "C", "R", "O", "Y"):
            continue
        if op == "T":
            state.clear()
            continue
        new = dict(r.get("new_vals") or {})
        old = dict(r.get("old_vals") or {})
        toast = set(r.get("toast_cols") or [])
        if op == "I":
            key = (new["repo"], new["path"])
            state[key] = new
        elif op == "U":
            key = (
                (old.get("repo") or new["repo"]),
                (old.get("path") or new["path"]),
            )
            prev = state.get(key, {})
            merged = dict(prev)
            merged.update(new)
            for col in toast:
                if col in prev:
                    merged[col] = prev[col]  # unchanged-TOAST keeps prior
            state[(new.get("repo", key[0]), new.get("path", key[1]))] = merged
            if key != (new.get("repo", key[0]), new.get("path", key[1])):
                state.pop(key, None)
        elif op == "D":
            state.pop((old["repo"], old["path"]), None)
    return state


def content_sha(state: dict[tuple[str, str], dict]) -> dict[tuple[str, str], str]:
    """The per-row invariant: sha256(content) (BASELINE.json input_hint)."""
    return {
        k: hashlib.sha256((v.get("content") or "").encode()).hexdigest()
        for k, v in state.items()
    }
