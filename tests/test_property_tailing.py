"""Property-based correctness for the bucketed-state tx assembler
(`streaming/tailing._assemble_impl`), driven WITHOUT Spark: random
transactions, random global row order (a file source makes no ordering
promise), random trigger slicing, random bucket assignment. Invariants:

1. complete-transaction-per-batch: any released batch carrying rows of
   tx T also carries a Commit row of T (real or synthesized) — the
   invariant `replay_batch`'s integrity census relies on;
2. exactly-once: every change row of a committed tx releases exactly
   once across all triggers; nothing of an uncommitted tx ever does;
3. bounded state: after the run, open state holds exactly the
   uncommitted txs' rows (markers hold the committed ones).

Pure-pandas, so hypothesis can afford real example counts (the
streaming integration paths are covered by test_tailing.py).
"""

from __future__ import annotations

import pickle

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from wal_listener_spark.streaming.tailing import _COLS, _assemble_impl

N_BUCKETS = 4


class _StubState:
    def __init__(self):
        self.value = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self.value is not None

    @property
    def get(self):
        return self.value

    def update(self, v):
        self.value = v

    def remove(self):
        self.value = None


def _row(lsn, tx, seq, op, val=None):
    r = {c: None for c in _COLS}
    r.update(lsn=lsn, tx_id=tx, seq=seq, op=op)
    if val is not None:
        r["new_vals"] = {"repo": "r", "path": f"k{val}"}
    return r


# a tx: id, #changes, committed? — plus a shuffling seed and slicing
tx_strategy = st.lists(
    st.tuples(st.integers(1, 4), st.booleans()), min_size=1, max_size=12
)


@given(
    txs=tx_strategy,
    order_seed=st.randoms(use_true_random=False),
    n_triggers=st.integers(1, 6),
)
@settings(max_examples=25, deadline=None)
def test_assembler_invariants(txs, order_seed, n_triggers):
    rows = []
    lsn = 10
    committed_ids, uncommitted_ids = set(), set()
    for i, (n_changes, committed) in enumerate(txs):
        tx = 500 + i
        rows.append(_row(lsn, tx, -1, "B"))
        lsn += 1
        for j in range(n_changes):
            rows.append(_row(lsn, tx, j, "I", val=f"{tx}.{j}"))
            lsn += 1
        if committed:
            rows.append(_row(lsn, tx, 99, "C"))
            lsn += 1
            committed_ids.add(tx)
        else:
            uncommitted_ids.add(tx)
    # tx-less control row rides bucket -1 and must always pass through
    rows.append(_row(1, -1, 0, "R"))

    order_seed.shuffle(rows)
    slices = [rows[i::n_triggers] for i in range(n_triggers)]

    states = {b: _StubState() for b in range(N_BUCKETS)}
    state_txless = _StubState()
    released: list[pd.DataFrame] = []
    for sl in slices:
        if not sl:
            continue
        pdf = pd.DataFrame(sl, columns=_COLS)
        by_bucket = pdf.groupby(
            pdf["tx_id"].map(lambda t: -1 if t < 0 else t % N_BUCKETS)
        )
        for b, g in by_bucket:
            state = state_txless if b < 0 else states[b]
            out = list(_assemble_impl((b,), iter([g.reset_index(drop=True)]), state))
            released.extend(p for p in out if len(p))

    # 1. complete transaction per released batch
    for p in released:
        for tx in p["tx_id"].dropna().unique():
            if tx < 0:
                continue
            tx_rows = p[p["tx_id"] == tx]
            assert (tx_rows["op"] == "C").any(), (
                f"tx {tx} released without a Commit in its batch"
            )

    # 2. exactly-once release of committed changes, never uncommitted
    all_rel = (
        pd.concat(released, ignore_index=True) if released else
        pd.DataFrame(columns=_COLS)
    )
    rel_changes = all_rel[all_rel["op"] == "I"]
    keys = sorted(
        (int(r.tx_id), int(r.seq)) for r in rel_changes.itertuples()
    )
    expected = sorted(
        (tx, j)
        for i, (n_changes, committed) in enumerate(txs)
        if (tx := 500 + i) in committed_ids
        for j in range(n_changes)
    )
    assert keys == expected  # exactly once, committed only
    # the R control row passed through exactly once
    assert int((all_rel["op"] == "R").sum()) == 1

    # 3. residual state: open buffers hold exactly the uncommitted txs
    open_left = set()
    for b, stt in states.items():
        if stt.exists:
            open_txs, markers = pickle.loads(bytes(stt.value[0]))
            open_left |= set(open_txs)
            assert set(markers) <= committed_ids
    assert open_left == uncommitted_ids
