"""Property tests for the CDC tables' newest semantics against a pure
Python reference model: randomized epoch sequences (inserts / updates /
deletes, out-of-order and replayed seqs) applied to BOTH layouts must
reproduce the model's sequential fenced-merge state, the change feed
(including the r11 FOLD fast path on merge-on-read) must equal the
model's net diff, and MERGE INTO's clause compilation must equal a
clause-by-clause reference evaluation."""

import os
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import CdcTable, PartitionedCdcTable

PAY = "k long, v long"
CH = PAY + ", seq long, op string"

# epochs: 1-3 batches of 1-5 changes; keys 0-5, seqs 1-9, any op —
# duplicate (k, seq) WITHIN an epoch is filtered (the table rejects
# it by contract); across epochs duplicates are allowed only if we
# keep seqs unique per key globally (the fold-on-read contract)
_CHANGE = st.tuples(st.integers(0, 5), st.integers(0, 99),
                    st.integers(1, 9),
                    st.sampled_from(["insert", "update", "delete"]))
EPOCHS = st.lists(st.lists(_CHANGE, min_size=1, max_size=5),
                  min_size=1, max_size=3)


def _dedupe(epochs):
    """Unique (k, seq) globally: the fold-on-read/fast-path contract
    (cross-epoch ties raise by design — tested separately)."""
    seen, out = set(), []
    for ep in epochs:
        batch = []
        for k, v, seq, op in ep:
            if (k, seq) not in seen:
                seen.add((k, seq))
                batch.append((k, v, seq, op))
        if batch:
            out.append(batch)
    return out


def _model(seed, epochs):
    """The sequential fenced merge, in plain Python: per key keep
    (seq, v, deleted); a change applies iff strictly newer."""
    state = {k: (0, v, False) for k, v in seed}
    for ep in epochs:
        last = {}
        for k, v, seq, op in ep:  # per-epoch winner: highest seq
            if k not in last or seq > last[k][1]:
                last[k] = (v, seq, op)
        for k, (v, seq, op) in last.items():
            cur = state.get(k)
            if cur is None or seq > cur[0]:
                state[k] = (seq, v, op == "delete")
    return state


def _live(state):
    return {k: v for k, (s, v, dead) in state.items() if not dead}


def _diff(seed, state):
    """Net change types between the seed and the final state, the
    _diff_snapshots contract: live↔live with moved seq = update,
    absent/dead → live = insert, live → dead = delete."""
    pre = {k: (0, v) for k, v in seed}
    out = {}
    for k, (seq, v, dead) in state.items():
        was_live = k in pre
        if was_live and not dead and seq != 0:
            out[k] = ("update", v)
        elif not was_live and not dead:
            out[k] = ("insert", v)
        elif was_live and dead:
            out[k] = ("delete", pre[k][1])
    return out


@settings(max_examples=10, deadline=None)
@given(epochs=EPOCHS)
def test_layouts_match_model_and_feed(spark, tmp_path_factory, epochs):
    epochs = _dedupe(epochs)
    if not epochs:
        return
    seed = [(0, 100), (1, 101), (2, 102), (3, 103)]
    base = tmp_path_factory.mktemp("cdcprop")
    want_state = _model(seed, epochs)
    want_live = _live(want_state)
    want_diff = _diff(seed, want_state)

    for i, make in enumerate((
            lambda p: CdcTable(p, "k", app_id="w"),
            lambda p: PartitionedCdcTable(p, "k", app_id="w",
                                          num_buckets=4,
                                          write_mode="merge_on_read"))):
        t = make(str(base / f"t{i}"))
        t.initialize(spark.createDataFrame(seed, PAY))
        for b, ep in enumerate(epochs):
            t(spark.createDataFrame(ep, CH), b)
        got = {r.k: r.v for r in t.current(spark).collect()}
        assert got == want_live, f"layout {i} state diverged"
        ch = t.changes_between(spark, -1, t._latest_version(spark))
        got_diff = {r.k: (r._change_type, r.v) for r in ch.collect()}
        assert got_diff == want_diff, f"layout {i} feed diverged"


_ASSIGN = st.sampled_from([None, {"v": "s.sv"}, {"v": "t.v + s.sv"}])
_DELCOND = st.sampled_from([None, True, "s.sv < 0", "t.v > 102"])
_INS = st.sampled_from([None, {"v": "s.sv"}, {"v": "s.sv * 2"}])


@settings(max_examples=10, deadline=None)
@given(src=st.lists(st.tuples(st.integers(0, 7), st.integers(-5, 5)),
                    min_size=1, max_size=6, unique_by=lambda t: t[0]),
       upd=_ASSIGN, dele=_DELCOND, ins=_INS)
def test_merge_into_matches_reference(spark, tmp_path_factory, src,
                                      upd, dele, ins):
    if upd is None and dele is None and ins is None:
        return
    seed = [(0, 100), (1, 101), (2, 102), (3, 103)]
    t = CdcTable(str(tmp_path_factory.mktemp("mi") / "t"), "k",
                 app_id="w")
    t.initialize(spark.createDataFrame(seed, PAY))
    t.merge_into(spark, spark.createDataFrame(src, "k long, sv long"),
                 when_matched_update=upd, when_matched_delete=dele,
                 when_not_matched_insert=ins)

    # clause-by-clause reference evaluation
    tgt = dict(seed)
    want = dict(tgt)
    for k, sv in src:
        if k in tgt:
            tv = tgt[k]
            dcond = (dele is True or (dele == "s.sv < 0" and sv < 0)
                     or (dele == "t.v > 102" and tv > 102))
            if dele is not None and dcond:
                want.pop(k, None)
            elif upd is not None:
                want[k] = sv if upd == {"v": "s.sv"} else tv + sv
        else:
            if ins is not None:
                want[k] = sv if ins == {"v": "s.sv"} else sv * 2
    got = {r.k: r.v for r in t.current(spark).collect()}
    assert got == want


# -- r12: composite-key lookup predicate vs a plain-Python model --------------

_KEYVAL = st.one_of(st.none(), st.integers(0, 3))
_NSVAL = st.one_of(st.none(), st.sampled_from(["a", "b"]))
_PROBE = st.tuples(_KEYVAL, _NSVAL)


@settings(max_examples=25, deadline=None)
@given(rows=st.lists(st.tuples(_KEYVAL, _NSVAL, st.integers(0, 99)),
                     min_size=1, max_size=10, unique_by=lambda r:
                     (r[0], r[1])),
       probes=st.lists(_PROBE, min_size=1, max_size=6))
def test_composite_lookup_matches_python_model(spark, tmp_path_factory,
                                               rows, probes):
    """lookup() with arbitrary composite probes — null slots, null
    keys in the DATA, absent pairs — equals the plain-Python set
    filter on both layouts (flat = predicate only; partitioned =
    predicate + bucket pruning + the typed literal probe frame)."""
    frame = spark.createDataFrame(rows, "k1 long, k2 string, v long")
    want = sorted(((r[0], r[1], r[2]) for r in rows
                   if (r[0], r[1]) in set(probes)),
                  key=repr)
    for layout in ("flat", "part"):
        base = str(tmp_path_factory.mktemp("cmplk"))
        if layout == "flat":
            t = CdcTable(f"{base}/t", ["k1", "k2"], app_id="w")
        else:
            t = PartitionedCdcTable(f"{base}/t", ["k1", "k2"],
                                    app_id="w", num_buckets=3)
        t.initialize(frame)
        got = sorted(((r.k1, r.k2, r.v) for r in
                      t.lookup(spark, probes).collect()), key=repr)
        assert got == want, (layout, got, want)
