#!/usr/bin/env python3
"""Calibrate the reader's per-shape pre-emption thresholds on v5 DEV.

Runs the learned reader ALONE (no fact chain, no span rules) over v5
train+dev items' raw contexts, bins (answer shape, confidence) against
correctness, and reports per-shape precision curves. The hi_conf_by_shape
table in answer/reader.py is set from this report: for each shape, the
lowest band edge above which dev precision is 1.0 (the round-4 "never
observed wrong" criterion, now per shape). Tuning discipline: train/dev
splits only — the v5 test split is never read here.

Usage: python tools/calibrate_reader.py [--ckpt checkpoints/reader.msgpack]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(REPO, "checkpoints",
                                                   "reader.msgpack"))
    ap.add_argument("--data", nargs="+",
                    default=[os.path.join(REPO, "samples", f)
                             for f in ("synth_v5_train.jsonl",
                                       "synth_v5_dev.jsonl")])
    ap.add_argument("--out", default=os.path.join(REPO, "reports",
                                                  "reader_calibration_r5.json"))
    args = ap.parse_args()

    from ahrag_tpu.answer.extractive import _clean_sentences
    from ahrag_tpu.answer.reader import ReaderAnswerer, answer_shape
    from ahrag_tpu.eval.answer_eval import squad_f1_em

    reader = ReaderAnswerer(args.ckpt, min_conf=0.0)
    rows = []
    for path in args.data:
        with open(path, encoding="utf-8") as fh:
            items = [json.loads(l) for l in fh if l.strip()]
        for it in items:
            ctx = "\n".join(f"[DETAIL:p{i}] " + " ".join(para)
                            for i, para in
                            enumerate(it["context"]["sentences"]))
            ans, conf = reader.answer(it["question"],
                                      _clean_sentences(ctx))
            sc = squad_f1_em(ans or "", it["answers"])
            rows.append({"qtype": it.get("qtype"), "conf": round(conf, 4),
                         "shape": answer_shape(ans) if ans else "none",
                         "f1": sc["f1"], "em": sc["em"]})

    bands = [0.0, 0.25, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 0.98]
    per_shape = {}
    for shape in ("year", "number", "name", "noun"):
        srs = [r for r in rows if r["shape"] == shape]
        curve = []
        for b in bands:
            sel = [r for r in srs if r["conf"] >= b]
            if not sel:
                curve.append({"band": b, "n": 0})
                continue
            curve.append({"band": b, "n": len(sel),
                          "precision_em": round(
                              sum(r["em"] >= 100 for r in sel) / len(sel), 3),
                          "mean_f1": round(
                              sum(r["f1"] for r in sel) / len(sel), 1)})
        per_shape[shape] = curve
    n = len(rows)
    agg = {"n": n,
           "reader_alone_f1": round(sum(r["f1"] for r in rows) / n, 2),
           "reader_alone_em": round(sum(r["em"] >= 100 for r in rows)
                                    / n * 100, 2),
           "per_qtype_f1": {qt: round(sum(r["f1"] for r in rows
                                          if r["qtype"] == qt)
                                      / max(1, len([r for r in rows
                                                    if r["qtype"] == qt])), 1)
                            for qt in sorted({r["qtype"] for r in rows})},
           "per_shape": per_shape}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(agg, f, indent=1)
    print(json.dumps({k: agg[k] for k in ("n", "reader_alone_f1",
                                          "reader_alone_em",
                                          "per_qtype_f1")}, indent=1))
    for shape, curve in per_shape.items():
        print(shape, [c for c in curve if c.get("n")])


if __name__ == "__main__":
    main()
