"""Steady-state maintenance of the incremental-curation indexes.

``scrub.curation_incremental`` (the declared, oracle-checked query)
demonstrates one batch probing a base corpus's persisted LSH + paragraph
indexes. Its steady-state contract — "accepted batch rows append their
own index entries, so batch N+1's probe sees batch N" — lives here:
:class:`CurationIndex` owns the two index artifacts as APPEND-ONLY
parquet stores and gives the pipeline its three verbs:

- :meth:`build` — index the curated base once (the O(corpus) step,
  amortized to zero);
- :meth:`probe` / :meth:`fresh_paras` — O(batch) candidate checks for an
  incoming batch (same join machinery as the declared query:
  ``dedup.lsh_index_probe`` and a paragraph-hash anti-join);
- :meth:`append_batch` — write the ACCEPTED docs' own index rows as one
  new parquet commit directory. Appending is O(batch): nothing existing
  is read or rewritten, which is precisely what keeps per-batch cost
  independent of corpus size.

Storage layout: each append lands under ``<root>/<index>/c<seq>-<token>/``
and reads glob the index directory — the "append = add data files"
half of a table format, which is all an append-only index needs. On a
cluster the same contract is an Iceberg/LocalTable APPEND commit with
snapshot isolation; the local layout keeps this demonstrable without a
metadata layer (two writers racing the same seq produce distinct token
dirs and both rows survive — append-only stores merge by union).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from iceberg_examples_spark.operators.dedup import (
    lsh_index_probe,
    minhash_index,
)


def _para_hashes(docs: DataFrame) -> DataFrame:
    from iceberg_examples_spark.operators.scrub import _paras, _with_tokens

    return _paras(_with_tokens(docs)).select("h").distinct()


def _overlap(thunks) -> None:
    """Run independent write actions from a 2-thread driver pool (guide
    §2.6: actions are only sequential because driver code calls them
    sequentially; the LSH-index write and the paragraph-hash write touch
    different directories and share no state, so the second job's tasks
    back-fill executors the first one's tail leaves idle)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        for f in pool.map(lambda t: t(), thunks):
            pass


class CurationIndex:
    """The curated corpus's LSH band index + paragraph-hash index as
    append-only parquet stores (see module docstring)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.lsh_dir = os.path.join(root, "lsh")
        self.para_dir = os.path.join(root, "paras")

    def _append(self, df: DataFrame, index_dir: str, key: str | None = None) -> None:
        # keyed append: a DETERMINISTIC dir name + overwrite mode makes
        # the append idempotent — a retried streaming epoch re-writes the
        # same dir instead of accumulating duplicate entries (the
        # foreachBatch at-least-once contract; see stream_curation_ingest)
        if key is not None:
            out = os.path.join(index_dir, f"k-{key}")
            df.write.mode("overwrite").parquet(out)
            return
        seq = len(os.listdir(index_dir)) if os.path.isdir(index_dir) else 0
        out = os.path.join(index_dir, f"c{seq:05d}-{uuid.uuid4().hex[:8]}")
        df.write.mode("error").parquet(out)

    def _read(
        self, index_dir: str, exclude_key: str | None = None
    ) -> DataFrame:
        """Read the whole index store; ``exclude_key`` skips one keyed
        append directory — a RETRIED epoch probes the index as it stood
        before its own (possibly already-committed) append, so it
        converges to the first attempt's accept set without the probe
        having to mask identity pairs globally (which would silently
        re-accept a doc_id re-ingested in a LATER epoch — ADVICE r7)."""
        if exclude_key is not None:
            parts = [
                os.path.join(index_dir, d)
                for d in sorted(os.listdir(index_dir))
                if d != f"k-{exclude_key}"
            ]
            if not parts:
                # the index holds ONLY the excluded epoch's own append
                # (first epoch retried): the view "as it stood before this
                # epoch" is legitimately empty — borrow the excluded dir's
                # schema rather than calling read.parquet() with no paths,
                # which raises a confusing TypeError (round-8 ADVICE)
                own = os.path.join(index_dir, f"k-{exclude_key}")
                return self.spark.read.parquet(own).limit(0)
            return self.spark.read.parquet(*parts)
        return self.spark.read.parquet(os.path.join(index_dir, "*"))

    # -- the O(corpus) step, once --------------------------------------
    def build(self, corpus: DataFrame) -> None:
        """Index the curated base corpus (columns: doc_id, text)."""
        _overlap(
            [
                lambda: self._append(
                    minhash_index(corpus.select("doc_id", "text")),
                    self.lsh_dir,
                ),
                lambda: self._append(_para_hashes(corpus), self.para_dir),
            ]
        )

    # -- O(batch) per incoming batch ------------------------------------
    def probe(
        self, batch: DataFrame, exclude_key: str | None = None
    ) -> DataFrame:
        """(batch_doc, base_doc, n_agree) near-dup links of a batch
        (doc_id, text) against everything indexed so far."""
        return self.probe_indexed(
            minhash_index(batch.select("doc_id", "text"), wide=False),
            exclude_key=exclude_key,
        )

    def probe_indexed(
        self, batch_idx: DataFrame, exclude_key: str | None = None
    ) -> DataFrame:
        """Probe with the batch's PRECOMPUTED index rows. A steady-state
        caller materializes the batch's signature pass once (it needs the
        same rows again for append_indexed and the accept report);
        re-deriving them per verb would run the batch's Arrow stage 2-3×
        per epoch — measured 5.0 → 3.5 s median on the two-epoch
        steady-state query at sf0.1. ``exclude_key``: a retried epoch
        passes its own append key so re-probing its already-committed
        entries converges (see _read)."""
        return lsh_index_probe(
            batch_idx.select(*self._lsh_cols(batch_idx)),
            self._read(self.lsh_dir, exclude_key=exclude_key),
        )

    @staticmethod
    def _lsh_cols(idx_rows: DataFrame) -> list[str]:
        """The LSH store's column set, in store order, from any frame
        that carries it (index rows may also carry text etc.)."""
        return ["doc_id"] + [
            c
            for c in idx_rows.columns
            if c.startswith("mh") or c.startswith("band")
        ]

    def fresh_paras(self, batch: DataFrame) -> DataFrame:
        """The batch's paragraph rows whose hash is NOT yet indexed."""
        from iceberg_examples_spark.operators.scrub import _paras, _with_tokens

        return _paras(_with_tokens(batch)).join(
            self._read(self.para_dir), "h", "left_anti"
        )

    def append_batch(self, accepted: DataFrame) -> None:
        """Append the ACCEPTED batch docs' own index rows — the O(batch)
        maintenance step that makes batch N visible to batch N+1's probe
        without ever rescanning or rewriting the existing index."""
        _overlap(
            [
                lambda: self._append(
                    minhash_index(
                        accepted.select("doc_id", "text"), wide=False
                    ),
                    self.lsh_dir,
                ),
                lambda: self._append(_para_hashes(accepted), self.para_dir),
            ]
        )

    def append_indexed(
        self, accepted_idx: DataFrame, key: str | None = None
    ) -> None:
        """append_batch from PRECOMPUTED index rows (must carry ``text``
        for the paragraph hashes) — no second signature pass; see
        probe_indexed. ``key`` makes the append idempotent (deterministic
        overwrite target) for at-least-once streaming epochs."""
        _overlap(
            [
                lambda: self._append(
                    accepted_idx.select(*self._lsh_cols(accepted_idx)),
                    self.lsh_dir,
                    key=key,
                ),
                lambda: self._append(
                    _para_hashes(accepted_idx.select("doc_id", "text")),
                    self.para_dir,
                    key=key,
                ),
            ]
        )
