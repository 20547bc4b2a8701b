"""Offline index build: the (n_ment x n_ent) exact cross-encoder score
matrix, computed as a mesh-sharded SPMD program.

This is the reference's single most expensive workload
(eval/run_cross_encoder_for_ment_ent_matrix_zeshel.py:166-281 — ~34M BERT
pair forwards for yugioh), which it scales by slicing mention ranges
across SLURM jobs. TPU-native design instead:

- entities are sharded across the mesh 'data' axis; each device scores
  every mention block against only its entity shard (embarrassingly
  parallel, zero collectives in the hot loop),
- pair construction (mention ⧺ entity[1:], reference semantics
  utils/data_process.py:949-959) happens device-side with broadcast +
  concat — no host loops, no host->device pair traffic; only the tiny
  mention block and the final score rows cross the host boundary,
- fixed shapes: entity shards pad to a multiple of the entity block and
  scores at padded columns are dropped on the host,
- mention blocks checkpoint to disk as chunk files for preemption
  safety (reference chunk protocol, combine_chunked_computations.py).
"""

from __future__ import annotations

import dataclasses
import logging
import pickle
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anncur_tpu.models.crossencoder import CrossEncoder

LOGGER = logging.getLogger(__name__)


class ChunkDirLock:
    """Single-writer guard for a chunk directory.

    The reference's only write-race protection is an interactive
    'Overwrite? 0 or 1' prompt (combine_chunked_computations.py:109-112).
    Here: O_EXCL lockfile with the owner pid; a lock whose pid is dead is
    stale and stolen; a live second writer fails loudly instead of
    interleaving chunk files.
    """

    def __init__(self, chunk_dir: str):
        import os
        import time as _time

        self.path = os.path.join(chunk_dir, ".lock")
        os.makedirs(chunk_dir, exist_ok=True)
        # the pid is written to a temp file that is hard-LINKED into
        # place: creation is atomic WITH content, so a reader can never
        # observe an empty lockfile and mistake a live owner (pid not yet
        # written) for a stale one — the O_EXCL-then-write sequence had
        # exactly that window.
        tmp = f"{self.path}.{os.getpid()}.tmp"
        while True:
            with open(tmp, "w") as fout:
                fout.write(str(os.getpid()))
            try:
                os.link(tmp, self.path)
                os.remove(tmp)
                return
            except FileExistsError:
                os.remove(tmp)
            owner = 0
            for _ in range(3):  # tolerate legacy/corrupt lockfiles briefly
                try:
                    owner = int(open(self.path).read().strip() or "0")
                except FileNotFoundError:
                    owner = -1  # released between our check and read: retry
                    break
                except (OSError, ValueError):
                    owner = 0
                if owner:
                    break
                _time.sleep(0.1)
            if owner == -1:
                continue
            if owner and _pid_alive(owner):
                raise RuntimeError(
                    f"chunk dir {chunk_dir} is being written by live pid {owner}"
                )
            self._steal_stale(owner)

    def _steal_stale(self, owner: int) -> None:
        """Remove a dead owner's lockfile, safely under concurrency.

        A bare read-check-remove is a TOCTOU race: two resumed writers
        can both observe the dead owner, then the slower remove() deletes
        the faster one's freshly-acquired LIVE lock and both "own" the
        dir. Stealers therefore serialize on a secondary O_EXCL mutex
        and RE-CHECK the owner inside it: normal acquirers can never
        replace an existing lock (os.link cannot overwrite), and no one
        else can remove it while we hold the mutex, so an owner that
        re-reads as dead inside the mutex is stable and safe to remove.
        Returning without removing is always safe — the caller loops and
        re-runs the live-owner check."""
        import os
        import time as _time

        mutex = self.path + ".steal"
        try:
            fd = os.open(mutex, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # another stealer is mid-steal (critical section is
            # microseconds) or crashed there: age out its mutex
            try:
                if _time.time() - os.path.getmtime(mutex) > 60.0:
                    os.remove(mutex)
            except (FileNotFoundError, OSError):
                pass
            _time.sleep(0.05)
            return
        try:
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            try:
                cur = int(open(self.path).read().strip() or "0")
            except FileNotFoundError:
                return  # released/stolen already; caller retries the link
            except (OSError, ValueError):
                cur = 0
            if cur != owner or (cur and _pid_alive(cur)):
                return  # changed hands since our check; caller re-checks
            LOGGER.warning("stealing stale chunk-dir lock from pid %s", owner)
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass
        finally:
            try:
                os.remove(mutex)
            except FileNotFoundError:
                pass

    def release(self) -> None:
        import os

        try:
            os.remove(self.path)
        except FileNotFoundError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()


def _pid_alive(pid: int) -> bool:
    import os

    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def build_pairs(ment_block: jax.Array, ent_block: jax.Array, pair_len: int) -> jax.Array:
    """Device-side pair tokens: (Bm, Lm) x (Be, Le) -> (Bm*Be, pair_len).

    pair = mention ⧺ entity[1:] (entity CLS dropped), zero-padded to
    ``pair_len`` (padding is masked inside the encoder).
    """
    bm, lm = ment_block.shape
    be, le = ent_block.shape
    left = jnp.broadcast_to(ment_block[:, None, :], (bm, be, lm))
    right = jnp.broadcast_to(ent_block[None, :, 1:], (bm, be, le - 1))
    pairs = jnp.concatenate([left, right], axis=-1).reshape(bm * be, lm + le - 1)
    if pair_len > lm + le - 1:
        pairs = jnp.pad(pairs, ((0, 0), (0, pair_len - (lm + le - 1))))
    return pairs


@dataclasses.dataclass
class ScoreMatrixBuilder:
    """Sharded exact-score-matrix computation.

    ``ment_block``: mentions scored per device step.
    ``ent_block``: entity chunk per inner loop iteration; the CE forward
    batch is ment_block * ent_block pairs.
    """

    encoder: CrossEncoder
    # None = all visible devices on the 'data' axis (built lazily in
    # __post_init__); serving-side callers (CurRetriever.add_items) may
    # not carry a mesh around
    mesh: Optional[Mesh] = None
    axis: str = "data"
    ment_block: int = 8
    ent_block: int = 64
    pair_pad_multiple: int = 128
    # Upper bound on CE pairs evaluated by ONE device program (per
    # device). Large corpora are processed in entity slabs of this many
    # pairs: unbounded single programs (minutes of device time) can trip
    # RPC deadlines on remote-TPU links and give no progress/preemption
    # granularity. ~32k pairs ~= 25 s at bert-base on v5e.
    max_pairs_per_program: int = 32768

    def __post_init__(self):
        # jitted step programs keyed by (lm, le, n_e_shard): _make_step
        # previously returned a fresh jax.jit closure per __call__, which
        # retraced + re-looked-up the compile cache every build — measured
        # 1659 vs 2307 pairs/s on v5e for repeat 32x2048 builds.
        self._step_cache: Dict[Tuple[int, int, int], Any] = {}
        if self.mesh is None:
            from anncur_tpu.parallel import make_mesh

            self.mesh = make_mesh((len(jax.devices()),), (self.axis,))

    def _make_step(self, params, lm: int, le: int, n_e_shard: int):
        key = (lm, le, n_e_shard)
        if key in self._step_cache:
            return self._step_cache[key]
        pair_len = lm + le - 1
        # clamp to the position table like the serving-side scorer
        # (retriever._make_pair_scorer): a 128 multiple on a model with
        # max_position_embeddings=64 would pad pairs past the embedding
        # table AND give offline/online different pair shapes (different
        # bf16 rounding between the train matrix and its consumers)
        pad = min(self.pair_pad_multiple, self.encoder.spec.max_position_embeddings)
        pair_len += (-pair_len) % pad
        n_chunks = n_e_shard // self.ent_block
        enc = self.encoder
        bm, be = self.ment_block, self.ent_block

        def local_fn(p, ment_block_toks, ent_shard):
            def body(c, acc):
                ents = lax.dynamic_slice_in_dim(ent_shard, c * be, be, axis=0)
                pairs = build_pairs(ment_block_toks, ents, pair_len)
                scores = enc.score(p, pairs, first_segment_end=lm)
                return lax.dynamic_update_slice_in_dim(
                    acc, scores.reshape(bm, be), c * be, axis=1
                )

            acc = jnp.zeros((bm, n_e_shard), jnp.float32)
            return lax.fori_loop(0, n_chunks, body, acc)

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(), P(), P(self.axis)),
            out_specs=P(None, self.axis),
            check_vma=False,
        )
        self._step_cache[key] = jax.jit(fn)
        return self._step_cache[key]

    def __call__(
        self,
        params,
        ment_tokens: np.ndarray,  # (n_m, Lm)
        ent_tokens: np.ndarray,  # (n_e, Le)
        progress_cb: Optional[Callable[[float], None]] = None,
        chunk_dir: Optional[str] = None,
        chunk_rows: int = 512,
    ) -> np.ndarray:
        """Returns the full (n_m, n_e) float32 score matrix on host.

        When ``chunk_dir`` is set, every ``chunk_rows`` mention rows are
        written as ``chunk_<start>.npz`` (resume: existing chunks are
        loaded, not recomputed).
        """
        import os

        n_m, lm = ment_tokens.shape
        n_e, le = ent_tokens.shape
        n_dev = self.mesh.shape[self.axis]

        # entity slab: bounded per-program work (see max_pairs_per_program),
        # capped at the (shard-padded) corpus so small corpora do not
        # inflate to a full slab
        shard_mult = n_dev * self.ent_block
        n_e_base = n_e + ((-n_e) % shard_mult)
        chunks_per_prog = max(
            1, self.max_pairs_per_program // (self.ment_block * self.ent_block)
        )
        slab = min(chunks_per_prog * self.ent_block * n_dev, n_e_base)
        n_e_pad = n_e_base + ((-n_e_base) % slab)
        slab_per_dev = slab // n_dev

        ent_padded = np.zeros((n_e_pad, le), ent_tokens.dtype)
        ent_padded[:n_e] = ent_tokens
        n_slabs = n_e_pad // slab

        step = self._make_step(params, lm, le, slab_per_dev)
        slab_sharding = NamedSharding(self.mesh, P(self.axis))
        ent_slabs = [
            jax.device_put(jnp.asarray(ent_padded[s * slab : (s + 1) * slab]), slab_sharding)
            for s in range(n_slabs)
        ]
        params = jax.device_put(params, NamedSharding(self.mesh, P()))

        out = np.zeros((n_m, n_e), np.float32)
        bm = self.ment_block
        t0 = time.time()

        chunk_start = 0
        chunk_buf = []
        lock = ChunkDirLock(chunk_dir) if chunk_dir is not None else None

        def flush_chunk(start, rows):
            if chunk_dir is not None and rows:
                os.makedirs(chunk_dir, exist_ok=True)
                np.savez_compressed(
                    os.path.join(chunk_dir, f"chunk_{start}.npz"),
                    scores=np.concatenate(rows, axis=0),
                    row_start=start,
                )

        def drain(pending_item):
            """Blocking pull of one dispatched (mention block x entity
            slab) step (jax arrays are futures: keeping one step in
            flight overlaps device compute + link transfer with the next
            dispatch). Returns rows-completed-through when the block's
            last slab lands, else None."""
            j, take_j, s, fut = pending_item
            scores_j = np.asarray(fut)  # (bm, slab)
            c0 = s * slab
            c1 = min(c0 + slab, n_e)
            out[j : j + take_j, c0:c1] = scores_j[:take_j, : c1 - c0]
            if s == n_slabs - 1:
                chunk_buf.append(out[j : j + take_j])
                if progress_cb is not None:
                    progress_cb((j + take_j) / n_m)
                return j + take_j
            return None

        try:
            pending = None
            i = 0
            while i < n_m:
                if chunk_dir is not None:
                    # chunk files are keyed by their exact start row, and
                    # flush boundaries are ment_block-aligned (the first
                    # bm multiple >= chunk_rows) — requiring
                    # i % chunk_rows == 0 here silently refused every
                    # chunk after the first when bm does not divide
                    # chunk_rows, recomputing hours of finished work
                    cpath = os.path.join(chunk_dir, f"chunk_{i}.npz")
                    if os.path.exists(cpath):
                        if pending is not None:
                            done_to = drain(pending)
                            pending = None
                            if done_to is not None:
                                flush_chunk(chunk_start, chunk_buf)
                                chunk_start, chunk_buf = done_to, []
                        data = np.load(cpath)
                        rows = data["scores"]
                        out[i : i + rows.shape[0]] = rows[:, :n_e]
                        i += rows.shape[0]
                        chunk_start = i
                        continue
                block = np.zeros((bm, lm), ment_tokens.dtype)
                take = min(bm, n_m - i)
                block[:take] = ment_tokens[i : i + take]
                block_dev = jnp.asarray(block)
                for s in range(n_slabs):
                    fut = step(params, block_dev, ent_slabs[s])  # async dispatch
                    if pending is not None:
                        done_to = drain(pending)
                        if (
                            done_to is not None
                            and chunk_dir is not None
                            and done_to - chunk_start >= chunk_rows
                        ):
                            flush_chunk(chunk_start, chunk_buf)
                            chunk_start, chunk_buf = done_to, []
                    pending = (i, take, s, fut)
                i += take
            if pending is not None:
                drain(pending)
            if chunk_dir is not None and chunk_buf:
                flush_chunk(chunk_start, chunk_buf)
        finally:
            # the lock must release even on crash/preemption, or a
            # same-process resume would refuse the chunk dir
            if lock is not None:
                lock.release()
        LOGGER.info(
            "score matrix %dx%d built in %.1fs (%.0f pairs/s)",
            n_m,
            n_e,
            time.time() - t0,
            n_m * n_e / max(time.time() - t0, 1e-9),
        )
        return out

    # ---------------- multi-host build -------------------------------- #

    def build_multihost(
        self,
        params,
        ment_tokens: np.ndarray,
        ent_tokens: np.ndarray,
        chunk_dir: str,
        chunk_rows: int = 512,
        progress_cb: Optional[Callable[[float], None]] = None,
    ) -> Optional[np.ndarray]:
        """Cross-process (DCN) build: each process computes a contiguous
        mention range over its LOCAL devices and writes chunk files into
        a per-process subdir of the shared ``chunk_dir``; after a global
        barrier, process 0 combines and returns the full matrix (other
        processes return None).

        This is the SPMD form of the reference's SLURM mention-range
        chunking + combiner (run_cross_encoder_for_ment_ent_matrix_
        zeshel.py:294, combine_chunked_computations.py:125-250):
        coordination stays filesystem-first, so a preempted process
        resumes from its own chunks, and the per-process build keeps the
        single-host fast path (entity shards over ICI, zero collectives
        in the hot loop). Requires ``self.mesh`` to contain only
        process-local devices and ``chunk_dir`` on a shared filesystem.
        """
        import os

        from anncur_tpu.indexer.combine import combine_chunks
        from anncur_tpu.parallel.multihost import barrier, process_range

        pid, n_proc = jax.process_index(), jax.process_count()
        not_local = [
            d for d in self.mesh.devices.flat if d.process_index != pid
        ]
        if not_local:
            raise ValueError(
                "build_multihost needs a process-LOCAL mesh (each process "
                f"builds its own mention range); mesh contains {len(not_local)} "
                "remote devices. Use a global mesh only for training."
            )
        n_m = ment_tokens.shape[0]
        start, end = process_range(n_m)
        subdir = os.path.join(chunk_dir, f"proc{pid:04d}")
        LOGGER.info(
            "multihost build: process %d/%d owns mention rows [%d, %d)",
            pid, n_proc, start, end,
        )
        if end > start:
            self(
                params,
                ment_tokens[start:end],
                ent_tokens,
                chunk_dir=subdir,
                chunk_rows=chunk_rows,
                progress_cb=progress_cb,
            )
        else:  # more processes than rows: still participate in the barrier
            os.makedirs(subdir, exist_ok=True)
        with open(os.path.join(subdir, "_done.json"), "w") as f:
            import json as _json

            _json.dump({"row_start": start, "row_end": end}, f)
        barrier("score_matrix_build_done")
        if pid != 0:
            return None
        parts = []
        for p in range(n_proc):
            s, e = process_range(n_m, n_proc, p)
            if e > s:
                parts.append(
                    combine_chunks(
                        os.path.join(chunk_dir, f"proc{p:04d}"), n_ments=e - s
                    )
                )
        out = np.concatenate(parts, axis=0)
        assert out.shape == (n_m, ent_tokens.shape[0]), out.shape
        return out

    # ---------------- paired embeddings mode -------------------------- #

    def paired_embeds(
        self,
        params,
        ment_tokens: np.ndarray,
        ent_tokens: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(n_m, n_e, h) mention and entity contextual embeddings from the
        joint forward (reference mode=embeds,
        run_cross_encoder_for_ment_ent_matrix_zeshel.py:126-163). Use for
        small n_m only — output is O(n_m * n_e * h). Entities are chunked
        (ent_block pairs per forward) so large corpora cannot OOM."""
        n_m, lm = ment_tokens.shape
        n_e, le = ent_tokens.shape
        pair_len = lm + le - 1
        pair_len += (-pair_len) % min(
            self.pair_pad_multiple, self.encoder.spec.max_position_embeddings
        )
        be = max(self.ent_block, 1)
        n_e_pad = n_e + ((-n_e) % be)
        ents_padded = np.zeros((n_e_pad, le), ent_tokens.dtype)
        ents_padded[:n_e] = ent_tokens
        ents_dev = jnp.asarray(ents_padded)

        # cached per shape key — a fresh local jit here retraced the
        # joint forward on EVERY paired_embeds call (the same pitfall
        # _step_cache exists to avoid for __call__)
        key = ("embeds", lm, le, pair_len)
        if key not in self._step_cache:
            enc = self.encoder

            def step(p, ment_row, ents):
                pairs = build_pairs(ment_row[None, :], ents, pair_len)
                return enc.embed_paired(p, pairs, first_segment_end=lm)

            self._step_cache[key] = jax.jit(step)
        step = self._step_cache[key]

        m_out = []
        e_out = []
        for i in range(n_m):
            m_chunks, e_chunks = [], []
            for c in range(0, n_e_pad, be):
                m_emb, e_emb = step(params, jnp.asarray(ment_tokens[i]), ents_dev[c : c + be])
                m_chunks.append(np.asarray(m_emb))
                e_chunks.append(np.asarray(e_emb))
            m_out.append(np.concatenate(m_chunks)[:n_e])
            e_out.append(np.concatenate(e_chunks)[:n_e])
        return np.stack(m_out), np.stack(e_out)


# --------------------------------------------------------------------- #
# on-disk format (reference pickle schema parity,
# run_cross_encoder_for_ment_ent_matrix_zeshel.py:230-240)
# --------------------------------------------------------------------- #


def save_score_matrix(
    path: str,
    ment_to_ent_scores: np.ndarray,
    mention_tokens_list: np.ndarray,
    entity_id_list: np.ndarray,
    entity_tokens_list: Optional[np.ndarray] = None,
    test_data: Any = None,
    arg_dict: Optional[Dict] = None,
) -> None:
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fout:
        pickle.dump(
            {
                "ment_to_ent_scores": np.asarray(ment_to_ent_scores),
                "test_data": test_data,
                "mention_tokens_list": np.asarray(mention_tokens_list),
                "entity_id_list": np.asarray(entity_id_list),
                "entity_tokens_list": None if entity_tokens_list is None else np.asarray(entity_tokens_list),
                "arg_dict": arg_dict or {},
            },
            fout,
        )


def load_score_matrix(path: str) -> Dict[str, Any]:
    with open(path, "rb") as fin:
        data = pickle.load(fin)
    # tolerate torch tensors in reference-produced pickles
    for key in ("ment_to_ent_scores", "mention_tokens_list", "entity_id_list", "entity_tokens_list"):
        val = data.get(key)
        if val is not None and hasattr(val, "numpy"):
            data[key] = val.numpy()
    return data
