"""Randomized cross-applier fault soak (VERDICT r15 #5).

Exactly-once coverage elsewhere is per-window kill-injection per
applier; this drives the INTERACTION surface: a NearDupScrubber and a
SortedDictStripper feeding ONE shared manifest store as two lineages,
with compaction and vacuum interleaved and crashes injected at both
applier windows, under Hypothesis-chosen orderings. After EVERY step:

- no document lost or duplicated (the store's doc_id multiset equals
  the model's),
- fences monotone per lineage (each lineage's committed fence equals
  the last batch it completed, never regressing),
- every readable generation consistent (each manifest file on disk
  references only segment directories that exist).

A crashed applier leaves its lineage "pending": Hypothesis is free to
run compact / vacuum / the OTHER lineage before the checkpoint-style
replay — the interleavings the per-applier tests cannot reach.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import settings
from hypothesis.stateful import (
    RuleBasedStateMachine,
    invariant,
    precondition,
    rule,
    run_state_machine_as_test,
)

from blockchaintoavro_spark.operators import manifest as mf
from blockchaintoavro_spark.operators import neardup_index as ndi
from blockchaintoavro_spark.operators.substr_sorted import (
    SortedDictStripper,
    write_dup_dictionary,
)

# BOTH lineages must land the same columns in the shared store: the
# stripper's output schema is fixed at (id, clean_text, n_stripped),
# so the scrubber's index is built over a clean_text column and its
# survivor rows carry the same three columns.
SCRUB_SCHEMA = "doc_id long, clean_text string, n_stripped long"
STRIP_IN_SCHEMA = "doc_id long, text string"
_DICT_BASE = "q" * 30


def _text_for(doc_id: int) -> str:
    # unique per id, long enough for shingling/k-gram windows
    return f"document {doc_id} body " + " ".join(
        f"tok{(doc_id * 31 + j) % 9973}" for j in range(12)
    )


def test_cross_applier_fault_soak(spark):
    class Soak(RuleBasedStateMachine):
        def __init__(self):
            super().__init__()
            root = tempfile.mkdtemp(prefix="soak-")
            self.out = os.path.join(root, "out")
            self.idx = os.path.join(root, "idx")
            self.dict_path = os.path.join(root, "dict")
            ndi.build_neardup_index(
                spark.createDataFrame([], SCRUB_SCHEMA), self.idx,
                kind="minhash", text_col="clean_text",
            )
            write_dup_dictionary(
                spark.createDataFrame(
                    [(900001, _DICT_BASE + "a")], STRIP_IN_SCHEMA
                ),
                self.dict_path,
                k=20,
            )
            self.scrub = ndi.NearDupScrubber(
                self.idx, self.out, fence_key="lineage-scrub"
            )
            self.strip = SortedDictStripper(
                self.dict_path, self.out, k=20, fence_key="lineage-strip"
            )
            # model state
            self.expected_ids: set[int] = set()
            self.kept_texts: list[tuple[int, str]] = []
            self.next_scrub_id = 1000
            self.next_strip_id = 2000
            self.scrub_batch = -1
            self.strip_batch = -1
            self.pending_scrub = None  # (rows, batch_id, new_ids)
            self.pending_strip = None

        # ------------------------------------------------------ helpers

        def _mk(self, rows, schema=SCRUB_SCHEMA):
            return spark.createDataFrame(rows, schema)

        def _scrub_rows(self, with_dup: bool):
            i = self.next_scrub_id
            self.next_scrub_id += 1
            rows = [(i, _text_for(i), 0)]
            new_ids = {i}
            if with_dup and self.kept_texts:
                # an exact duplicate of an already-kept document: the
                # scrubber must drop it (near-dup of indexed history)
                j = self.next_scrub_id
                self.next_scrub_id += 1
                rows.append((j, self.kept_texts[0][1], 0))
            return rows, new_ids

        def _apply_scrub(self, rows, batch_id, new_ids):
            self.scrub(self._mk(rows), batch_id)
            self.scrub_batch = batch_id
            self.expected_ids |= new_ids
            for did, text, _ in rows:
                if did in new_ids:
                    self.kept_texts.append((did, text))

        def _apply_strip(self, rows, batch_id, new_ids):
            self.strip(self._mk(rows, STRIP_IN_SCHEMA), batch_id)
            self.strip_batch = batch_id
            self.expected_ids |= new_ids

        # -------------------------------------------------------- rules

        @precondition(lambda self: self.pending_scrub is None)
        @rule()
        def scrub_clean(self):
            rows, new_ids = self._scrub_rows(with_dup=True)
            self._apply_scrub(rows, self.scrub_batch + 1, new_ids)

        @precondition(lambda self: self.pending_scrub is None)
        @rule()
        def scrub_crash_before_out_commit(self):
            rows, new_ids = self._scrub_rows(with_dup=False)
            bid = self.scrub_batch + 1
            real = mf.commit_append

            def boom(*a, **k):
                raise RuntimeError("soak: crash before out commit")

            mf.commit_append = boom
            try:
                with pytest.raises(RuntimeError, match="soak:"):
                    self.scrub(self._mk(rows), bid)
            finally:
                mf.commit_append = real
            # nothing committed: the model is unchanged, replay pending
            self.pending_scrub = (rows, bid, new_ids)

        @precondition(lambda self: self.pending_scrub is None)
        @rule()
        def scrub_crash_between_out_and_index(self):
            rows, new_ids = self._scrub_rows(with_dup=False)
            bid = self.scrub_batch + 1
            real = ndi._append_bands

            def boom(*a, **k):
                raise RuntimeError("soak: crash between out and index")

            ndi._append_bands = boom
            try:
                with pytest.raises(RuntimeError, match="soak:"):
                    self.scrub(self._mk(rows), bid)
            finally:
                ndi._append_bands = real
            # the OUT store committed this batch (out lands first): the
            # documents are already visible and must never duplicate
            self.scrub_batch = bid
            self.expected_ids |= new_ids
            for did, text, _ in rows:
                self.kept_texts.append((did, text))
            self.pending_scrub = (rows, bid, set())

        @precondition(lambda self: self.pending_scrub is not None)
        @rule()
        def scrub_replay(self):
            rows, bid, new_ids = self.pending_scrub
            self.pending_scrub = None
            self._apply_scrub(rows, bid, new_ids)

        @precondition(lambda self: self.pending_strip is None)
        @rule()
        def strip_clean(self):
            i = self.next_strip_id
            self.next_strip_id += 1
            rows = [(i, _DICT_BASE + f"a tail {i}")]
            self._apply_strip(rows, self.strip_batch + 1, {i})

        @precondition(lambda self: self.pending_strip is None)
        @rule()
        def strip_crash_before_commit(self):
            i = self.next_strip_id
            self.next_strip_id += 1
            rows = [(i, _text_for(i))]
            bid = self.strip_batch + 1
            real = mf.commit_append

            def boom(*a, **k):
                raise RuntimeError("soak: strip crash before commit")

            mf.commit_append = boom
            try:
                with pytest.raises(RuntimeError, match="soak:"):
                    self.strip(self._mk(rows, STRIP_IN_SCHEMA), bid)
            finally:
                mf.commit_append = real
            self.pending_strip = (rows, bid, {i})

        @precondition(lambda self: self.pending_strip is not None)
        @rule()
        def strip_replay(self):
            rows, bid, new_ids = self.pending_strip
            self.pending_strip = None
            self._apply_strip(rows, bid, new_ids)

        @precondition(
            lambda self: mf.latest_manifest(spark, self.out) is not None
        )
        @rule()
        def compact(self):
            ndi.compact_scrub_output(spark, self.out, keep_generations=2)

        @precondition(
            lambda self: mf.latest_manifest(spark, self.out) is not None
        )
        @rule()
        def vacuum(self):
            mf.vacuum_store(
                spark, self.out, keep_generations=2,
                orphan_grace_seconds=3600.0,
            )

        # --------------------------------------------------- invariants

        @invariant()
        def no_loss_no_duplicates(self):
            if mf.latest_manifest(spark, self.out) is None:
                assert not self.expected_ids
                return
            got = sorted(
                r["doc_id"]
                for r in ndi.read_scrubbed(spark, self.out).collect()
            )
            assert got == sorted(self.expected_ids), (
                f"store={got} model={sorted(self.expected_ids)}"
            )

        @invariant()
        def fences_monotone_per_lineage(self):
            for key, want in (
                ("lineage-scrub", self.scrub_batch),
                ("lineage-strip", self.strip_batch),
            ):
                got = mf.last_committed_batch(spark, self.out, key)
                if want < 0:
                    # a crash-before-commit may leave the lineage
                    # entirely unrecorded — but never ahead of the model
                    assert got is None or got < 0 or got == want
                else:
                    assert got == want, (key, got, want)

        @invariant()
        def readable_generations_consistent(self):
            mdir = os.path.join(self.out, "_manifests")
            for mfile in glob.glob(os.path.join(mdir, "manifest-*.json")):
                with open(mfile, "rb") as f:
                    man = json.loads(f.read())
                for seg in man.get("segments", []):
                    assert os.path.isdir(os.path.join(self.out, seg)), (
                        f"{mfile} references missing segment {seg}"
                    )

    run_state_machine_as_test(
        Soak,
        settings=settings(
            max_examples=3,
            stateful_step_count=10,
            deadline=None,
            derandomize=True,
        ),
    )
