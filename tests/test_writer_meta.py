"""Round-14 epoch-store writer-metadata hardening (ADVICE r13 +
verdict task 2).

- pointer + base commit in ONE atomic `_WRITER` file (no crash window
  between two os.replace calls);
- re-registration detection survives path aliasing (realpath) and a
  MOVED checkpoint (same persistent query id — same stream);
- a store with committed history but no pointer treats its first
  registration as a re-registration (direct epoch_append flows);
- rebase refuses while the old writer stream is still active;
- `assert_stamp_format` refuses a rebased store whose live rows may
  carry pre-fix RAW epoch stamps; `epoch_restamp` repairs it.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.sources import snapshots as snap
from data_warehouse_nhom8_spark.streaming import jobs


def _put(spark, path, eid, k, v, raw_stamp=False):
    stamp = eid if raw_stamp else snap.on_disk_epoch(path, eid)
    df = spark.createDataFrame([(k, v, stamp)], "k long, v string, epoch long")
    snap.epoch_append(df, path, eid)


def test_writer_meta_single_atomic_file(spark, tmp_path):
    path = str(tmp_path / "store")
    snap.register_store_checkpoint(path, str(tmp_path / "ckA"))
    with open(os.path.join(path, snap._WRITER_META)) as fh:
        meta = json.load(fh)
    assert set(meta) == {"checkpoint", "base", "query_id"}
    assert meta["base"] == 0
    # no legacy split files are written anymore — the crash window
    # between their two os.replace commits is structurally gone
    assert not os.path.exists(os.path.join(path, snap._EPOCH_BASE))
    assert not os.path.exists(os.path.join(path, snap._CHECKPOINT_PTR))


def test_legacy_split_files_still_readable(spark, tmp_path):
    path = str(tmp_path / "store")
    os.makedirs(path)
    with open(os.path.join(path, snap._CHECKPOINT_PTR), "w") as fh:
        fh.write(str(tmp_path / "ckOld"))
    with open(os.path.join(path, snap._EPOCH_BASE), "w") as fh:
        fh.write("7")
    assert snap.epoch_base(path) == 7
    cp, base, qid = snap._writer_meta(path)
    assert cp == str(tmp_path / "ckOld") and base == 7 and qid is None
    # once new code re-registers, the atomic file takes precedence
    snap.register_store_checkpoint(path, str(tmp_path / "ckNew"))
    assert os.path.exists(os.path.join(path, snap._WRITER_META))


def test_relative_path_alias_is_not_a_reregistration(spark, tmp_path):
    """The ADVICE scenario: the SAME checkpoint handed over as a
    different string (relative path from another cwd, symlink, extra
    slashes) must not bump the base while the same stream keeps
    writing — its replayed epoch would commit twice."""
    path = str(tmp_path / "store")
    ck = str(tmp_path / "ckA")
    snap.register_store_checkpoint(path, ck)
    for e in range(3):
        _put(spark, path, e, e, f"v{e}")
    # same checkpoint, aliased spellings
    snap.register_store_checkpoint(path, ck + os.sep)
    cwd = os.getcwd()
    try:
        os.chdir(str(tmp_path))
        snap.register_store_checkpoint(path, "ckA")
    finally:
        os.chdir(cwd)
    assert snap.epoch_base(path) == 0, "alias registration bumped the base"


def test_moved_checkpoint_same_query_id_is_same_stream(spark, tmp_path):
    path = str(tmp_path / "store")
    ck_a, ck_b = str(tmp_path / "ckA"), str(tmp_path / "ckB")
    for ck in (ck_a, ck_b):
        os.makedirs(ck)
        with open(os.path.join(ck, "metadata"), "w") as fh:
            json.dump({"id": "q-same"}, fh)
    snap.register_store_checkpoint(path, ck_a)
    for e in range(2):
        _put(spark, path, e, e, f"v{e}")
    snap.register_store_checkpoint(path, ck_b)  # moved, same query id
    assert snap.epoch_base(path) == 0, "moved checkpoint forced a rebase"


def test_first_registration_of_populated_store_rebases(spark, tmp_path):
    """ADVICE low: a store populated by direct epoch_append calls (no
    pointer) that is then registered must rebase — the new stream's
    epoch 0 would otherwise collide with existing on-disk ids."""
    path = str(tmp_path / "store")
    for e in range(3):
        _put(spark, path, e, e, f"v{e}")
    snap.register_store_checkpoint(path, str(tmp_path / "ckFirst"))
    assert snap.epoch_base(path) == 3
    # lost-pointer variant: history via the fold watermark only
    path2 = str(tmp_path / "store2")
    for e in range(2):
        _put(spark, path2, e, e, f"v{e}")
    snap.epoch_compact(spark, path2)
    assert snap.epoch_folded_through(path2) >= 0
    snap.register_store_checkpoint(path2, str(tmp_path / "ckFirst2"))
    assert snap.epoch_base(path2) == snap.epoch_folded_through(path2) + 1


def test_rebase_refused_while_old_writer_stream_active(spark, tmp_path):
    path = str(tmp_path / "store")
    ck_a = str(tmp_path / "ckA")
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ck_a)
        .start()
    )
    try:
        snap.register_store_checkpoint(path, ck_a)
        with pytest.raises(RuntimeError, match="still active"):
            snap.register_store_checkpoint(path, str(tmp_path / "ckB"), spark)
        # the refused rebase committed nothing
        cp, base, _qid = snap._writer_meta(path)
        assert os.path.realpath(cp) == os.path.realpath(ck_a) and base == 0
    finally:
        q.stop()
        q.awaitTermination()
    snap.register_store_checkpoint(path, str(tmp_path / "ckB"), spark)
    cp, _, _ = snap._writer_meta(path)
    assert os.path.realpath(cp) == os.path.realpath(str(tmp_path / "ckB"))


def test_raw_stamped_store_refused_then_repaired(spark, tmp_path):
    """Verdict task 2: a store whose live epochs were written by
    PRE-fix code after a re-registration (raw stamps, rebased dir
    ids) is detected by the metadata-only guard and refused; the
    offline epoch_restamp repair rewrites stamps from the log, after
    which the new writer's rows win LWW as the contract says."""
    path = str(tmp_path / "store")
    snap.register_store_checkpoint(path, str(tmp_path / "ckA"))
    _put(spark, path, 0, 1, "old0")
    _put(spark, path, 5, 1, "old5")
    snap.register_store_checkpoint(path, str(tmp_path / "ckB"))  # base -> 6
    # simulate PRE-fix code: it never wrote the marker, and its sink
    # stamped the new stream's rows with RAW ids (0), not on-disk (6)
    os.remove(os.path.join(path, snap._STAMP_FMT))
    _put(spark, path, 0, 1, "new0", raw_stamp=True)
    with pytest.raises(RuntimeError, match="stamp-format"):
        jobs._lww_read(spark, path, ["k"], [])
    snap.epoch_restamp(spark, path)
    got = {tuple(r) for r in jobs._lww_read(spark, path, ["k"], []).collect()}
    assert got == {(1, "new0")}, got
    # additive store (no epoch column): restamp just marks it
    path2 = str(tmp_path / "add")
    snap.epoch_append(spark.createDataFrame([(1, 2)], "k long, n long"), path2, 0)
    os.remove(os.path.join(path2, snap._STAMP_FMT))
    snap.epoch_restamp(spark, path2)
    assert snap._has_stamp_marker(path2)


def test_fresh_and_never_rebased_stores_pass_stamp_guard(spark, tmp_path):
    path = str(tmp_path / "store")
    _put(spark, path, 0, 1, "a")
    snap.assert_stamp_format(path)  # base 0 — consistent by construction
    got = jobs._lww_read(spark, path, ["k"], [])
    assert [tuple(r) for r in got.collect()] == [(1, "a")]
    # a CURRENT-code re-registration keeps the marker: rows before the
    # rebase were consistent (base 0), rows after are stamped via
    # on_disk_epoch (the r13 source tripwire pins that)
    snap.register_store_checkpoint(path, str(tmp_path / "ckB"))
    _put(spark, path, 0, 1, "b")
    snap.assert_stamp_format(path)
    got = {tuple(r) for r in jobs._lww_read(spark, path, ["k"], []).collect()}
    assert got == {(1, "b")}


def test_wiped_and_recreated_checkpoint_at_same_path_rebases(spark, tmp_path):
    """r14 review finding: realpath equality alone treated a
    deleted-and-recreated checkpoint (the standard stream reset) as
    the SAME stream — the fresh stream's epoch 0 would then commit as
    a new attempt of the historical epoch 0 (GC'ing real rows) or
    trip the fold watermark. The persistent query id recorded in
    _WRITER exposes the wipe."""
    import json as _json

    path, ck = str(tmp_path / "store"), str(tmp_path / "ck")

    def write_meta(qid):
        os.makedirs(ck, exist_ok=True)
        with open(os.path.join(ck, "metadata"), "w") as fh:
            _json.dump({"id": qid}, fh)

    write_meta("query-one")
    snap.register_store_checkpoint(path, ck)
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    snap.epoch_append(df, path, 0)
    snap.epoch_append(df, path, 1)
    # replay-style re-registration: same path, same query id -> no bump
    snap.register_store_checkpoint(path, ck)
    assert snap.epoch_base(path) == 0

    # wipe + recreate at the SAME path: fresh metadata id
    shutil.rmtree(ck)
    write_meta("query-two")
    snap.register_store_checkpoint(path, ck)
    assert snap.epoch_base(path) == 2, "fresh stream must rebase past epochs 0-1"
    # and the new stream's epoch 0 lands as on-disk epoch 2
    assert snap.on_disk_epoch(path, 0) == 2

    # a wipe with metadata NOT yet recreated (stream not started)
    shutil.rmtree(ck)
    os.makedirs(ck)
    snap.epoch_append(df, path, 0)  # raw id 0 -> on-disk 2 committed
    snap.register_store_checkpoint(path, ck)
    assert snap.epoch_base(path) == 3, "missing metadata after a recorded id is a wipe"


def test_preregistered_then_started_stream_is_not_a_wipe(spark, tmp_path):
    """Sink factories register BEFORE the stream first runs (no
    checkpoint metadata yet -> recorded id None). The id appearing
    later must read as the same stream (backfilled), never a rebase."""
    import json as _json

    path, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    os.makedirs(ck)
    snap.register_store_checkpoint(path, ck)  # no metadata yet
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    snap.epoch_append(df, path, 0)
    with open(os.path.join(ck, "metadata"), "w") as fh:
        _json.dump({"id": "query-late"}, fh)
    snap.register_store_checkpoint(path, ck)  # id becomes visible
    assert snap.epoch_base(path) == 0, "first-start is not a wipe"
    assert snap._writer_meta(path)[2] == "query-late"
    # and from here on, a wipe IS detected
    shutil.rmtree(ck)
    os.makedirs(ck)
    snap.register_store_checkpoint(path, ck)
    assert snap.epoch_base(path) == 1


def test_wiped_checkpoint_rebase_refused_while_old_writer_active(
    spark, tmp_path
):
    """VERDICT r14 task 7: on the WIPED-checkpoint rebase path the
    pointer's metadata carries the new stream's id, so the pointer-
    resolved guard can't see the live old writer — the id recorded in
    _WRITER at the prior registration must refuse the rebase instead
    (a rebase under a live writer lets its replayed in-flight epoch
    double-commit under two id bases)."""
    path = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        snap.register_store_checkpoint(path, ck)
        assert snap._writer_meta(path)[2] == str(q.id)
        # the wipe: same checkpoint PATH, fresh metadata id — while
        # the old stream is still running
        with open(os.path.join(ck, "metadata"), "w") as fh:
            json.dump({"id": "fresh-after-wipe"}, fh)
        with pytest.raises(RuntimeError, match="still active"):
            snap.register_store_checkpoint(path, ck, spark)
        # the refused rebase committed nothing
        assert snap._writer_meta(path)[1] == 0
    finally:
        q.stop()
        q.awaitTermination()
    snap.register_store_checkpoint(path, ck, spark)  # stopped: fine
    assert snap._writer_meta(path)[2] == "fresh-after-wipe"


def test_restamp_refused_while_writer_stream_active(spark, tmp_path):
    """epoch_restamp rewrites live epochs in place — running it under
    a live writer would race the stream's own appends. The offline
    contract is enforced mechanically, same as epoch_compact."""
    path = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    _put(spark, path, 0, 1, "a")
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        snap.register_store_checkpoint(path, ck)
        with pytest.raises(RuntimeError, match="still active"):
            snap.epoch_restamp(spark, path)
    finally:
        q.stop()
        q.awaitTermination()
    snap.epoch_restamp(spark, path)  # offline: fine
    assert snap._has_stamp_marker(path)


def test_restamp_mid_compaction_race_is_refused(spark, tmp_path, monkeypatch):
    """VERDICT r14 task 7: a compaction landing between restamp's
    epoch listing and its rewrite must fail LOUDLY (the epoch_append
    fold-watermark tripwire), never silently resurrect folded rows as
    fresh attempts. Simulated at the exact race window: the fold's
    pointer swap has committed but its dir GC hasn't run (the
    documented crash-safe window), and restamp holds the stale
    listing."""
    path = str(tmp_path / "store")
    _put(spark, path, 0, 1, "a")
    _put(spark, path, 1, 2, "b")

    real = snap._epoch_attempts
    state = {"raced": False}

    def racing(p):
        atts = real(p)
        if not state["raced"] and p == path:
            state["raced"] = True
            # the race: an offline compaction folds everything right
            # after restamp takes its listing — GC suppressed, i.e.
            # the swap-committed-GC-pending window
            orig_rm = snap.shutil.rmtree
            monkeypatch.setattr(snap.shutil, "rmtree", lambda *a, **k: None)
            try:
                snap.epoch_compact(spark, path)
            finally:
                monkeypatch.setattr(snap.shutil, "rmtree", orig_rm)
        return atts

    monkeypatch.setattr(snap, "_epoch_attempts", racing)
    with pytest.raises(ValueError, match="already folded"):
        snap.epoch_restamp(spark, path)
    monkeypatch.setattr(snap, "_epoch_attempts", real)
    # the store itself is intact: the fold's base holds both rows
    got = {tuple(r) for r in jobs._lww_read(spark, path, ["k"], []).collect()}
    assert got == {(1, "a"), (2, "b")}
