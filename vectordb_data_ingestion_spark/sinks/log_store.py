"""Chunked (log-structured) commit log for the manifest sink.

``ManifestVectorSink`` commits every mutation by CAS-rewriting ONE
manifest object holding the full segment list plus per-file lists for
partially-dereferenced segments. That is correct at any scale, but the
commit COST grows with sink metadata size: at high segment / partial-file
counts, manifest bytes x the measured ~7 commits/s plateau becomes the
write-throughput ceiling (SCALE.md r8: "sharding the manifest into a
chunked log (Delta-style) is the documented next step"; VERDICT r8
item 2).

:class:`LogConditionalStore` removes that boundary without touching the
sink: it is a :class:`~.commit_store.ConditionalStore` ADAPTER that
presents the exact key surface the sink already speaks —

- ``MANIFEST``            (CAS-committed current state)
- ``MANIFEST.v<id>``      (immutable per-generation history)
- everything else         (``RETAINED_FLOOR`` etc. pass through)

— but stores commits as an append-only chain of small DELTA records plus
periodic full checkpoints in the INNER store (the Delta-Lake/Iceberg
commit-log shape from the public literature):

- ``MLOG.<gen>``      — create-only delta record: segment entries added /
  removed / updated by commit ``gen``, plus changed top-level fields.
  Winning the create of ``MLOG.<token+1>`` IS the commit arbiter, so the
  adapter inherits the inner store's atomicity — CAS over the chain head
  without ever rewriting it. Commit bytes are O(mutation), never O(sink).
- ``MLOG_CKPT.<gen>`` — create-only FULL manifest snapshot, written by
  the committer of every ``checkpoint_every``-th generation. Checkpoints
  are a pure optimization: reconstruction probes lower boundaries when
  one is missing (a committer crash loses nothing but replay length), so
  correctness NEVER depends on a checkpoint existing.
- ``MLOG_HINT``       — monotonic hint of a known checkpointed
  generation; readers start their forward head-probe there.
- ``MLOG_PRUNED``     — monotonic retention watermark: generations at or
  below it read as gone (``read_at`` fails loudly, the same contract the
  monolithic store enforces by deleting ``MANIFEST.v<id>`` keys), and
  their delta records become physically deletable once a checkpoint at a
  boundary above them exists.

Every sink-level correctness property (lost-response guards, crash
orphans, replay idempotence, snapshot reads, vacuum retention) holds
unchanged because the sink's protocol logic is unchanged — the drills in
tests/test_manifest_sink.py re-run against this store via the binding
fixture. Reads concurrent with history GC follow the same
maintenance-window contract as vacuum itself; the head probe re-checks
the pruned watermark when its forward walk ends at a missing record and
restarts from the fresh hint, so a GC racing a reader can only cost a
retry, never a stale head.
"""

from __future__ import annotations

import json
import threading
from collections import OrderedDict

from vectordb_data_ingestion_spark.sinks.commit_store import (
    ConditionalStore,
    cas_update,
)

_MANIFEST = "MANIFEST"
_VPREFIX = "MANIFEST.v"
_REC = "MLOG."
_CKPT = "MLOG_CKPT."
_HINT = "MLOG_HINT"
_PRUNED = "MLOG_PRUNED"

# top-level manifest fields that are NOT diffed: segments get entry-level
# deltas, commit_id is the record's position in the chain
_STRUCTURAL = ("segments", "commit_id")


def _split_top(manifest: dict | None) -> dict:
    return {
        k: v for k, v in (manifest or {}).items() if k not in _STRUCTURAL
    }


def _diff(old: dict | None, new: dict) -> dict:
    """Delta record transforming manifest ``old`` into ``new``: O(touched
    entries), never O(all entries). Top-level fields carry their full new
    value when changed (the first record therefore carries layout and
    schema in full)."""
    sentinel = object()
    old_top = _split_top(old)
    rec: dict = {}
    top = {
        k: v
        for k, v in _split_top(new).items()
        if old_top.get(k, sentinel) != v
    }
    if top:
        rec["top"] = top
    old_segs = {s["dir"]: s for s in (old or {}).get("segments", [])}
    new_segs = {s["dir"]: s for s in new.get("segments", [])}
    add = [e for d, e in new_segs.items() if d not in old_segs]
    update = [
        e for d, e in new_segs.items() if d in old_segs and old_segs[d] != e
    ]
    remove = [d for d in old_segs if d not in new_segs]
    if add:
        rec["add"] = add
    if update:
        rec["update"] = update
    if remove:
        rec["remove"] = remove
    return rec


def _apply(state: dict | None, rec: dict, gen: int) -> dict:
    """Replay one delta record onto ``state`` (None = the empty chain),
    producing the manifest as of generation ``gen``. Dict insertion order
    reproduces the sink's segment-list order for every mutation shape it
    performs (untouched entries keep their relative order, fresh entries
    append)."""
    if state is None:
        segs: OrderedDict[str, dict] = OrderedDict()
        top: dict = {}
    else:
        segs = OrderedDict((s["dir"], s) for s in state["segments"])
        top = _split_top(state)
    top.update(rec.get("top", {}))
    for e in rec.get("update", []):
        segs[e["dir"]] = e
    for d in rec.get("remove", []):
        segs.pop(d, None)
    for e in rec.get("add", []):
        segs[e["dir"]] = e
    return {**top, "segments": list(segs.values()), "commit_id": gen}


class LogConditionalStore:
    """See module docstring. ``inner`` is any
    :class:`~.commit_store.ConditionalStore`; ``checkpoint_every`` is the
    full-snapshot cadence (amortized commit bytes = delta +
    full/``checkpoint_every``)."""

    def __init__(
        self, inner: ConditionalStore, checkpoint_every: int = 32
    ):
        if checkpoint_every < 1:
            raise ValueError("checkpoint_every must be >= 1")
        self.inner = inner
        self.checkpoint_every = int(checkpoint_every)
        self._lock = threading.Lock()
        # gen -> manifest dict; bounded replay memo (diffs in put_if and
        # descending history walks hit it). Entries are never mutated in
        # place — _apply builds fresh dicts and callers parse their own
        # JSON copies.
        self._cache: OrderedDict[int, dict] = OrderedDict()
        self._cache_max = 16

    # -- cache ----------------------------------------------------------

    def _cache_put(self, gen: int, state: dict) -> None:
        with self._lock:
            self._cache[gen] = state
            self._cache.move_to_end(gen)
            while len(self._cache) > self._cache_max:
                self._cache.popitem(last=False)

    def _cache_get(self, gen: int) -> dict | None:
        with self._lock:
            return self._cache.get(gen)

    # -- chain plumbing ---------------------------------------------------

    def _int_key(self, key: str) -> int:
        cur = self.inner.get(key)
        return int(cur[0].decode("utf-8")) if cur is not None else 0

    def _pruned(self) -> int:
        return self._int_key(_PRUNED)

    def _bump_monotonic(self, key: str, value: int) -> None:
        cas_update(
            self.inner,
            key,
            lambda cur: str(
                max(value, int(cur) if cur else 0)
            ).encode(),
        )

    def _record(self, gen: int) -> dict | None:
        cur = self.inner.get(f"{_REC}{gen}")
        return (
            json.loads(cur[0].decode("utf-8")) if cur is not None else None
        )

    def _checkpoint_base(self, gen: int) -> tuple[int, dict | None]:
        """Largest checkpoint at a cadence boundary <= ``gen`` (falling
        back through missing boundaries — checkpoints are best-effort),
        as ``(base_gen, state)``; ``(0, None)`` = replay from the empty
        chain."""
        c = self.checkpoint_every
        b = (gen // c) * c
        while b >= c:
            hit = self._cache_get(b)
            if hit is not None:
                return b, hit
            cur = self.inner.get(f"{_CKPT}{b}")
            if cur is not None:
                state = json.loads(cur[0].decode("utf-8"))
                self._cache_put(b, state)
                return b, state
            b -= c
        return 0, None

    def _state_at(self, gen: int) -> dict | None:
        """Manifest as of generation ``gen``; None when the chain never
        reached it or retention pruned it."""
        if gen < 1 or gen <= self._pruned():
            return None
        hit = self._cache_get(gen)
        if hit is not None:
            return hit
        base, state = self._checkpoint_base(gen)
        for g in range(base + 1, gen + 1):
            rec = self._record(g)
            if rec is None:
                # beyond head, or a GC raced us mid-replay: either way
                # this generation is not reconstructible now
                return None
            state = _apply(state, rec, g)
        if state is not None:
            self._cache_put(gen, state)
        return state

    def _head(self) -> tuple[int, dict | None]:
        """Current chain head as ``(gen, state)`` — ``(0, None)`` for an
        empty sink. Forward-probes from the checkpoint hint; when the
        probe terminates inside the pruned zone (a concurrent GC deleted
        records under us) it restarts from the fresh hint."""
        for _ in range(10):
            hint = self._int_key(_HINT)
            # the newest generation this adapter has already materialized
            # beats the (checkpoint-cadence) hint as a probe base: one
            # commit later, the probe then replays exactly ONE record
            # instead of everything since the last checkpoint. Sound
            # because records are immutable and the chain is dense — any
            # known-good (gen, state) is a valid base — and unpruned
            # cached states stay correct even after their record is GC'd.
            with self._lock:
                cached = max(self._cache, default=0)
            if cached > hint:
                hint = cached
            gen, state = (
                (hint, self._state_at(hint)) if hint else (0, None)
            )
            if hint and state is None:
                # hint points at a pruned/unreachable generation (stale
                # hint after heavy GC): fall back to the newest
                # checkpoint the hint names via the boundary walk
                gen, state = self._checkpoint_base(hint)
            while True:
                rec = self._record(gen + 1)
                if rec is None:
                    break
                gen += 1
                state = _apply(state, rec, gen)
            pruned = self._pruned()
            # gen == 0 counts as a valid (empty) head ONLY when nothing
            # was ever pruned — a nonzero watermark with a zero probe
            # means our hint was stale while GC deleted the low records
            if gen > pruned or (gen == 0 and pruned == 0):
                if state is not None:
                    self._cache_put(gen, state)
                return gen, state
            # probe ended at/below the watermark: GC raced us — retry
        raise RuntimeError(
            "log store head probe kept landing below the pruned "
            "watermark — retention state is advancing faster than reads"
        )

    # -- ConditionalStore surface ----------------------------------------

    def get(self, key: str):
        if key == _MANIFEST:
            gen, state = self._head()
            if gen == 0:
                return None
            return json.dumps(state).encode(), gen
        if key.startswith(_VPREFIX):
            gen = int(key[len(_VPREFIX):])
            state = self._state_at(gen)
            if state is None:
                return None
            return json.dumps(state).encode(), gen
        return self.inner.get(key)

    def put_if(self, key: str, data: bytes, token) -> bool:
        if key == _MANIFEST:
            return self._commit_record(token, data=data)
        if key.startswith(_VPREFIX):
            # history publication / healing: the delta record written by
            # the commit itself IS the durable history here — nothing to
            # publish separately (create-only contract: True = "exists
            # after the call", which it does)
            return True
        return self.inner.put_if(key, data, token)

    # -- parsed-handle seam (in-process fast path) -----------------------

    def get_state(self, key: str):
        """``get()`` for manifest keys returning the PARSED dict instead
        of JSON bytes: the adapter reconstructs heads and history as
        dicts anyway, so rendering them to JSON only for the sink to
        parse them back was pure O(sink-metadata) driver CPU per commit
        (VERDICT r9 item 3). The returned dict is shared with the
        adapter's replay cache — the caller must treat it as IMMUTABLE
        (the manifest sink does: it builds new lists/entries on every
        mutation, never writing into a manifest it read; the randomized
        model drill would catch a violation as read divergence)."""
        if key == _MANIFEST:
            gen, state = self._head()
            return None if gen == 0 else (state, gen)
        if key.startswith(_VPREFIX):
            gen = int(key[len(_VPREFIX):])
            state = self._state_at(gen)
            return None if state is None else (state, gen)
        raise KeyError(f"get_state is manifest-only, got {key!r}")

    def put_state_if(self, key: str, state: dict, token) -> bool:
        """``put_if()`` taking the parsed manifest dict: the delta
        record is computed directly on the dict (O(mutation) serialize),
        and the full-state JSON is rendered only at checkpoint
        boundaries — amortized O(sink)/checkpoint_every instead of
        O(sink) on every commit. History keys are the same no-op publish
        as the byte path. The dict may enter the adapter's replay cache:
        the caller must not mutate it afterwards (same contract as
        :meth:`get_state`)."""
        if key == _MANIFEST:
            return self._commit_record(token, new=state)
        if key.startswith(_VPREFIX):
            return True
        raise KeyError(f"put_state_if is manifest-only, got {key!r}")

    def delete_if(self, key: str, token) -> bool:
        if key == _MANIFEST:
            raise NotImplementedError(
                "the manifest chain head cannot be deleted — prune "
                "history via MANIFEST.v<gen> deletes (vacuum)"
            )
        if key.startswith(_VPREFIX):
            gen = int(key[len(_VPREFIX):])
            # History-pruning contract, pinned (VERDICT r9): callers
            # delete a CONTIGUOUS PREFIX of generations strictly below
            # the chain head — vacuum walks [prev_floor, retained_floor)
            # with retained_floor <= head (manifest_sink.vacuum). The
            # watermark is monotonic-MAX, so deleting v<g> makes EVERY
            # generation <= g unreadable; a non-prefix caller trying to
            # drop one mid-range generation would silently widen
            # retention, and one reaching the head would wedge every
            # reader. The prefix property below the head is unobservable
            # per-call (vacuum legitimately deletes descending), but the
            # head bound is — refuse loudly instead of advancing the
            # watermark over the live chain.
            head_gen, _ = self._head()
            if gen >= head_gen:
                raise RuntimeError(
                    f"history delete of generation {gen} at/above the "
                    f"chain head {head_gen}: MANIFEST.v* deletes must "
                    "prune a contiguous prefix strictly below the head "
                    "(vacuum's contract) — the monotonic pruned "
                    "watermark would make the live chain unreadable"
                )
            self._bump_monotonic(_PRUNED, gen)
            self._gc_records()
            return True
        return self.inner.delete_if(key, token)

    # -- commit / retention ------------------------------------------------

    def _commit_record(
        self, token, new: dict | None = None, data: bytes | None = None
    ) -> bool:
        """One commit attempt from either seam: ``data`` (JSON bytes,
        the ConditionalStore surface) or ``new`` (parsed dict, the
        in-process fast path). Parsing/serializing the full state is
        deferred to the latest possible point — stale/fabricated tokens
        never pay it, and with a parsed handle the only full-state
        serialize left is the every-``checkpoint_every`` snapshot."""
        if token is not None and not isinstance(token, int):
            return False
        base_gen = 0 if token is None else int(token)
        if (
            base_gen
            and self._record(base_gen) is None
            and self.inner.get(f"{_CKPT}{base_gen}") is None
        ):
            # fabricated/expired token: its generation is on the chain
            # neither as a record nor as a checkpoint. The checkpoint leg
            # matters: GC may delete the HEAD's own record when a
            # boundary checkpoint coincides with it (retain_versions=0
            # vacuum at a boundary generation) — that head is still a
            # perfectly valid commit base.
            return False
        if base_gen and base_gen <= self._pruned():
            # stale-token check must run UNCONDITIONALLY, before the
            # replay-cache consult: a long-idle handle retrying a very
            # stale token whose generation sits at a checkpoint boundary
            # (record + successor GC'd, CKPT surviving) passes the
            # existence check above and would otherwise skip the
            # staleness check via a cache hit, win the MLOG.<gen> create
            # of a GC'd slot, and report success for a commit no reader
            # can ever reconstruct (ADVICE r9).
            return False
        gen = base_gen + 1
        if new is None:
            new = json.loads(data.decode("utf-8"))
        if int(new.get("commit_id", gen)) != gen:
            raise RuntimeError(
                f"manifest commit_id {new.get('commit_id')} does not "
                f"match the chain position {gen} implied by its token — "
                "refusing to fork the log"
            )
        old = self._cache_get(base_gen) if base_gen else None
        if base_gen and old is None:
            old = self._state_at(base_gen)
            if old is None:
                return False  # pruned under us — token is stale
        rec = _diff(old, new)
        if not self.inner.put_if(
            f"{_REC}{gen}", json.dumps(rec).encode(), None
        ):
            return False  # another committer won this generation
        self._cache_put(gen, new)
        if gen % self.checkpoint_every == 0:
            # best-effort full snapshot + hint advance; a crash here only
            # lengthens later replays (reconstruction walks back to the
            # previous boundary). On the parsed seam this is the ONLY
            # full-state serialize a commit ever pays.
            if data is None:
                data = json.dumps(new).encode("utf-8")
            self.inner.put_if(f"{_CKPT}{gen}", data, None)
            self._bump_monotonic(_HINT, gen)
        return True

    def _gc_records(self) -> int:
        """Physically delete delta records the retention watermark has
        aged out, once a checkpoint boundary above them exists: records
        <= B are unneeded iff ``MLOG_CKPT.<B>`` exists and B <= pruned+1,
        because every live generation g > pruned reconstructs from that
        checkpoint and records (B, g]. The hint is advanced FIRST so new
        readers never start a probe inside the zone being deleted.
        Returns records removed."""
        pruned = self._pruned()
        if pruned < 1:
            return 0
        c = self.checkpoint_every
        b = ((pruned + 1) // c) * c
        while b >= c and self.inner.get(f"{_CKPT}{b}") is None:
            b -= c
        if b < c:
            return 0  # no covering checkpoint yet — records must stay
        self._bump_monotonic(_HINT, b)
        removed = 0
        g = b
        while g >= 1:
            cur = self.inner.get(f"{_REC}{g}")
            if cur is None:
                break  # contiguous chain: older records already gone
            if self.inner.delete_if(f"{_REC}{g}", cur[1]):
                removed += 1
            g -= 1
        # checkpoints BELOW the covering boundary are unreachable by any
        # live reconstruction (every live g >= B resolves its base at or
        # above CKPT.<B>, and a reader stranded on an older hint retries
        # from the advanced one) — delete them so total control-plane
        # storage is bounded by the retained window, not commit count
        b2 = b - c
        while b2 >= c:
            cur = self.inner.get(f"{_CKPT}{b2}")
            if cur is None:
                break  # older checkpoints already collected
            if self.inner.delete_if(f"{_CKPT}{b2}", cur[1]):
                removed += 1
            b2 -= c
        return removed
