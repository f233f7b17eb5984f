"""Keyframe database: place-recognition queries as dense masked matmuls.

Replaces ``KeyFrameDatabase`` (src/KeyFrameDatabase.cc): the inverted file
(word → keyframe list, :35) becomes a dense [K, n_words] BoW matrix, so
``DetectLoopCandidates`` (:73) and ``DetectRelocalizationCandidates``
(:196) are one matvec against the whole database plus covisibility-group
accumulation — exactly the "loop-closure candidate scoring sharded across
the keyframe DB" shape of the north star (shard the K rows and the matvec
+ top-k ride the mesh).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.models import map_state as M


class KeyFrameDB(NamedTuple):
    bow: jax.Array       # [K, W] float32 — L2-normalized tf-idf rows
    valid: jax.Array     # [K] bool — registered in DB (KeyFrameDatabase::add)

    @staticmethod
    def empty(max_keyframes: int, n_words: int) -> "KeyFrameDB":
        return KeyFrameDB(bow=jnp.zeros((max_keyframes, n_words), jnp.float32),
                          valid=jnp.zeros((max_keyframes,), bool))

    def add(self, kf: jax.Array, vec: jax.Array) -> "KeyFrameDB":
        return KeyFrameDB(bow=self.bow.at[kf].set(vec),
                          valid=self.valid.at[kf].set(True))

    def erase(self, kf: jax.Array) -> "KeyFrameDB":
        return self._replace(valid=self.valid.at[kf].set(False))


def group_accumulated_scores(scores: jax.Array, covis: jax.Array,
                             cand_mask: jax.Array, top_n: int = 10
                             ) -> Tuple[jax.Array, jax.Array]:
    """Covisibility-group score accumulation (KeyFrameDatabase.cc:145-171):
    each candidate's group = itself + its top-10 covisible neighbours;
    group score = Σ of candidate scores inside the group; each group is
    represented by its best-scoring member.

    Returns (acc_score [K], best_in_group [K] — the representative's score
    for the group led by k)."""
    K = scores.shape[0]
    # top-10 covisible neighbour mask per KF, plus self
    w = jnp.where(cand_mask[None, :], covis, -1)      # only candidates count
    topw, topi = jax.lax.top_k(w, top_n)              # [K, 10]
    member = jnp.zeros((K, K), bool).at[
        jnp.arange(K)[:, None], jnp.where(topw > 0, topi, K)].set(True)
    member = member.at[jnp.arange(K), jnp.arange(K)].set(True)
    s = jnp.where(cand_mask, scores, 0.0)
    acc = member @ s[:, None]                          # [K, 1]
    acc = acc[:, 0]
    best = jnp.max(jnp.where(member, s[None, :], 0.0), axis=1)
    return acc, best


def detect_candidates(
    db: KeyFrameDB,
    ms: M.MapState,
    query_bow: jax.Array,
    query_kf: jax.Array,          # −1 for relocalization (frame query)
    min_score: jax.Array,         # 0.0 for relocalization
    n_candidates: int,
) -> Tuple[jax.Array, jax.Array]:
    """Shared core of DetectLoopCandidates / DetectRelocalizationCandidates.

    Loop mode (query_kf ≥ 0): exclude the query and everything covisible
    with it (KeyFrameDatabase.cc:78-96), gate by min_score (min similarity
    to the query's own neighbours, LoopClosing.cc:160-174).
    Returns (candidate kf ids [n_candidates], scores; −1 padded)."""
    covis = M.covisibility(ms)
    scores = db.bow @ query_bow                        # [K] — the matvec
    ok = db.valid & ms.kf_valid
    is_loop_query = query_kf >= 0
    qsafe = jnp.where(is_loop_query, query_kf, 0)
    connected = (covis[qsafe] > 0) | (
        jnp.arange(scores.shape[0]) == qsafe)
    ok = ok & jnp.where(is_loop_query, ~connected, True)
    ok = ok & (scores >= min_score)

    acc, best_of_group = group_accumulated_scores(scores, covis, ok)
    best_acc = jnp.max(jnp.where(ok, acc, 0.0))
    # groups above 0.75·bestAcc (KeyFrameDatabase.cc:174); keep each group's
    # best member as its candidate
    group_ok = ok & (acc >= 0.75 * best_acc)
    cand_score = jnp.where(group_ok, scores, -1.0)
    top_s, top_i = jax.lax.top_k(cand_score, n_candidates)
    return jnp.where(top_s > 0, top_i, -1), top_s
