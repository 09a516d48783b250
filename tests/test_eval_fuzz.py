"""Differential fuzzing of eval/clearmot.py against a brute-force oracle.

The scorer carries the entire quality claim (motmetrics is unavailable
in-env), so this file re-derives CLEAR-MOT / IDF1 from their definitions
with *no shared code* and checks agreement on randomized scenarios:

  * per-frame correspondence: the continuation rule (a ground-truth id
    keeps its previous hypothesis while both are present and within the
    IoU gate) followed by an OPTIMAL assignment of the remainder — the
    oracle enumerates every injective partial matching and picks
    max-cardinality then min-total-distance, which is what Hungarian with
    a large invalid cost computes (motmetrics MOTAccumulator semantics);
  * event counts (matches, switches, FP, misses) and MOTA / MOTP /
    MT-PT-ML from the CLEAR definitions (Bernardin & Stiefelhagen 2008);
  * IDF1 by brute-force over all injective trajectory mappings maximizing
    total in-gate co-occurrence (Ristani et al. 2016, IDTP), vs the
    scorer's LP formulation;
  * the OVERALL merge row vs scoring the concatenation directly.

Scenarios are generated with continuous random coordinates so assignment
ties have measure zero.
"""

import itertools

import numpy as np
import pytest

from siammot_tpu.eval.clearmot import (MOTAccumulator, iou_distance_matrix,
                                       merge_summaries)


# ---------------------------------------------------------------- oracle

def _iou(a, b):
    ax, ay, aw, ah = a
    bx, by, bw, bh = b
    x1, y1 = max(ax, bx), max(ay, by)
    x2, y2 = min(ax + aw, bx + bw), min(ay + ah, by + bh)
    iw, ih = max(0.0, x2 - x1), max(0.0, y2 - y1)
    inter = iw * ih
    union = aw * ah + bw * bh - inter
    return inter / union if union > 0 else 0.0


def _best_partial_matching(valid, dist):
    """All injective gt->pred matchings over `valid` pairs; return the one
    with max cardinality, tie-broken by min total distance."""
    gs = sorted({g for g, _ in valid})
    ps = sorted({p for _, p in valid})
    best = (0, 0.0, {})
    # enumerate subsets of gt of every size, then injections into preds
    for k in range(min(len(gs), len(ps)), 0, -1):
        for g_sub in itertools.combinations(gs, k):
            for p_perm in itertools.permutations(ps, k):
                pairs = list(zip(g_sub, p_perm))
                if any((g, p) not in valid for g, p in pairs):
                    continue
                tot = sum(dist[(g, p)] for g, p in pairs)
                cand = (k, tot, dict(pairs))
                if cand[0] > best[0] or (cand[0] == best[0]
                                         and cand[1] < best[1] - 1e-12):
                    best = cand
        if best[0] == k:
            break       # larger cardinality already impossible below
    return best[2]


class Oracle:
    """Brute-force CLEAR/IDF1 accumulator written from the definitions."""

    def __init__(self, iou_thresh):
        self.iou_thresh = iou_thresh
        self.prev = {}                        # gt id -> hypothesis id
        self.frames = []                      # (gt dict, pred dict) per frame
        self.matches = 0
        self.switches = 0
        self.fp = 0
        self.misses = 0
        self.gt_total = 0
        self.dist = 0.0
        self.per_gt_present = {}
        self.per_gt_matched = {}

    def update(self, gt, pred):
        """gt/pred: {id: xywh box}."""
        self.frames.append((dict(gt), dict(pred)))
        self.gt_total += len(gt)
        for g in gt:
            self.per_gt_present[g] = self.per_gt_present.get(g, 0) + 1

        in_gate = {(g, p): 1.0 - _iou(bg, bp)
                   for g, bg in gt.items() for p, bp in pred.items()
                   if _iou(bg, bp) >= self.iou_thresh}

        # continuation
        matched = {}
        for g in gt:
            p = self.prev.get(g)
            if p is not None and p in pred and (g, p) in in_gate:
                matched[g] = p
        rem_valid = {(g, p): d for (g, p), d in in_gate.items()
                     if g not in matched and p not in matched.values()}
        matched.update(_best_partial_matching(set(rem_valid), rem_valid))

        for g, p in matched.items():
            prev = self.prev.get(g)
            if prev is not None and prev != p:
                self.switches += 1
            self.matches += 1
            self.dist += in_gate[(g, p)]
            self.per_gt_matched[g] = self.per_gt_matched.get(g, 0) + 1
            self.prev[g] = p
        self.misses += len(gt) - len(matched)
        self.fp += len(pred) - len(matched)

    # -- definition-level metrics -----------------------------------------
    def mota(self):
        return 1.0 - (self.fp + self.misses + self.switches) / self.gt_total

    def motp(self):
        return self.dist / self.matches if self.matches else np.nan

    def mt_pt_ml(self):
        mt = pt = ml = 0
        for g, n in self.per_gt_present.items():
            r = self.per_gt_matched.get(g, 0) / n
            if r >= 0.8:
                mt += 1
            elif r <= 0.2:
                ml += 1
            else:
                pt += 1
        return mt, pt, ml

    def idtp_idf1(self):
        gt_ids = sorted({g for f in self.frames for g in f[0]})
        pr_ids = sorted({p for f in self.frames for p in f[1]})
        co = {}
        for gt, pred in self.frames:
            for g, bg in gt.items():
                for p, bp in pred.items():
                    if _iou(bg, bp) >= self.iou_thresh:
                        co[(g, p)] = co.get((g, p), 0) + 1
        best = 0
        for k in range(min(len(gt_ids), len(pr_ids)), -1, -1):
            for g_sub in itertools.combinations(gt_ids, k):
                for p_perm in itertools.permutations(pr_ids, k):
                    best = max(best, sum(co.get((g, p), 0)
                                         for g, p in zip(g_sub, p_perm)))
        total = (sum(self.per_gt_present.values())
                 + sum(len(f[1]) for f in self.frames))
        return best, (2.0 * best / total if total else np.nan)


# ------------------------------------------------------------- generator

def _random_scenario(rng, n_frames, n_gt, n_pred_ids, iou_thresh):
    """Tracks wander; hypotheses follow a gt with jitter (sometimes out of
    gate), swap identities, drop out, or appear as pure false positives."""
    frames = []
    gt_pos = rng.uniform(10, 80, size=(n_gt, 2))
    assign = list(rng.permutation(n_pred_ids))    # pred id following gt i
    for _ in range(n_frames):
        gt_pos += rng.uniform(-4, 4, size=gt_pos.shape)
        gt = {}
        pred = {}
        for i in range(n_gt):
            if rng.rand() < 0.85:
                w, h = rng.uniform(8, 16), rng.uniform(8, 16)
                gt[i + 1] = (gt_pos[i, 0], gt_pos[i, 1], w, h)
                if rng.rand() < 0.8:
                    jitter = rng.uniform(-2, 2, 2)
                    if rng.rand() < 0.15:          # out-of-gate drift
                        jitter += rng.uniform(20, 40, 2)
                    pid = int(assign[i % len(assign)]) + 101
                    pred[pid] = (gt_pos[i, 0] + jitter[0],
                                 gt_pos[i, 1] + jitter[1], w, h)
        if rng.rand() < 0.2 and len(assign) > 1:   # identity swap event
            j, k = rng.choice(len(assign), 2, replace=False)
            assign[j], assign[k] = assign[k], assign[j]
        if rng.rand() < 0.3:                        # stray FP
            pid = 200 + rng.randint(3)
            if pid not in pred:
                pred[pid] = tuple(rng.uniform(5, 80, 2)) + \
                    (rng.uniform(8, 16), rng.uniform(8, 16))
        frames.append((gt, pred))
    return frames


def _run_both(frames, iou_thresh):
    acc = MOTAccumulator()
    ora = Oracle(iou_thresh)
    for gt, pred in frames:
        g_ids, g_boxes = list(gt), [gt[g] for g in gt]
        p_ids, p_boxes = list(pred), [pred[p] for p in pred]
        d = iou_distance_matrix(g_boxes, p_boxes, 1.0 - iou_thresh)
        acc.update(g_ids, p_ids, d)
        ora.update(gt, pred)
    return acc, ora


N_SCENARIOS = 1000


def test_fuzz_scorer_vs_bruteforce_oracle():
    rng = np.random.RandomState(20260818)
    checked_nontrivial = 0
    for case in range(N_SCENARIOS):
        iou_thresh = 0.5
        frames = _random_scenario(
            rng, n_frames=rng.randint(3, 8), n_gt=rng.randint(1, 4),
            n_pred_ids=rng.randint(1, 4), iou_thresh=iou_thresh)
        acc, ora = _run_both(frames, iou_thresh)
        ctx = f"case {case}"
        assert acc.num_matches == ora.matches, ctx
        assert acc.num_switches == ora.switches, ctx
        assert acc.num_fp == ora.fp, ctx
        assert acc.num_misses == ora.misses, ctx
        assert acc.num_gt == ora.gt_total, ctx
        if ora.gt_total:
            assert acc.mota() == pytest.approx(ora.mota(), abs=1e-9), ctx
        if ora.matches:
            assert acc.motp() == pytest.approx(ora.motp(), abs=1e-9), ctx
            checked_nontrivial += 1
        assert acc.mt_pt_ml() == ora.mt_pt_ml(), ctx
        idtp, idf1 = ora.idtp_idf1()
        got = acc.idf1()
        if not (np.isnan(got) and np.isnan(idf1)):
            assert got == pytest.approx(idf1, abs=1e-9), ctx
    assert checked_nontrivial > N_SCENARIOS // 2    # scenarios aren't vacuous


def test_fuzz_overall_merge_row():
    """merge_summaries' OVERALL equals recomputing the rates from summed
    event counts / summed IDTP across sequences (fresh accumulator state
    per sequence, as motmetrics does per-video)."""
    rng = np.random.RandomState(77)
    for case in range(50):
        seqs = {}
        oracles = {}
        for s in range(rng.randint(2, 5)):
            frames = _random_scenario(
                rng, n_frames=rng.randint(3, 8), n_gt=rng.randint(1, 4),
                n_pred_ids=rng.randint(1, 4), iou_thresh=0.5)
            acc, ora = _run_both(frames, 0.5)
            seqs[f"seq{s}"] = acc
            oracles[f"seq{s}"] = ora
        merged = merge_summaries(seqs)
        fp = sum(o.fp for o in oracles.values())
        fn = sum(o.misses for o in oracles.values())
        sw = sum(o.switches for o in oracles.values())
        gt = sum(o.gt_total for o in oracles.values())
        assert merged["num_false_positives"] == fp, case
        assert merged["num_misses"] == fn, case
        assert merged["num_switches"] == sw, case
        assert merged["mota"] == pytest.approx(1.0 - (fp + fn + sw) / gt,
                                               abs=1e-9), case
        idtp = sum(o.idtp_idf1()[0] for o in oracles.values())
        total = sum(sum(o.per_gt_present.values())
                    + sum(len(f[1]) for f in o.frames)
                    for o in oracles.values())
        assert merged["idf1"] == pytest.approx(2.0 * idtp / total,
                                               abs=1e-9), case
        matches = sum(o.matches for o in oracles.values())
        dist = sum(o.dist for o in oracles.values())
        if matches:
            assert merged["motp"] == pytest.approx(dist / matches,
                                                   abs=1e-9), case
