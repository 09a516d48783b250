#!/usr/bin/env python3
"""Summarize a multi-session training campaign from its train-dir log.

Parses ``log.txt`` (appended across sessions by tools/train_net.py) for
iteration/loss lines and resume markers, and emits a markdown loss-curve
table with resume points marked — the VERDICT r3 item-4 deliverable
("loss curve across >=3 sessions with resume points marked").

Usage: python tools/report_campaign.py TRAIN_DIR [--every 500] [--out MD]
"""

import argparse
import os
import re


def parse_log(path):
    """Returns (rows, resumes): rows = [(iter, loss, lr?)], resumes =
    [(iter, timestamp)]."""
    rows, resumes = [], []
    # trainer format: "iter 20/6500  loss 4.7344 (med 4.7344)  ..."
    it_re = re.compile(
        r"iter\s+(\d+)/\d+\s+loss\s+[0-9.]+\s+\(med\s+([0-9.]+)\)")
    res_re = re.compile(r"^([\d\-\s:,]+).*resumed from .* at iter (\d+)")
    with open(path) as f:
        for line in f:
            m = res_re.search(line)
            if m:
                resumes.append((int(m.group(2)), m.group(1).strip()))
                continue
            m = it_re.search(line)
            if m:
                rows.append((int(m.group(1)), float(m.group(2))))
    return rows, resumes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("train_dir")
    ap.add_argument("--every", type=int, default=500)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    log = os.path.join(args.train_dir, "log.txt")
    rows, resumes = parse_log(log)
    if not rows:
        raise SystemExit(f"no iteration lines found in {log}")

    resume_iters = {it for it, _ in resumes}
    lines = ["| iter | smoothed loss | |", "|---|---|---|"]
    last_marked = -1
    for it, loss in rows:
        mark = ""
        crossed = [r for r in sorted(resume_iters)
                   if last_marked < r <= it]
        if crossed:
            mark = "**<- session resume @ " + ",".join(map(str, crossed)) \
                + "**"
        if it % args.every == 0 or crossed or it == rows[-1][0]:
            lines.append(f"| {it} | {loss:.4f} | {mark} |")
            last_marked = it
    md = (f"Campaign log: {len(rows)} logged steps, "
          f"{len(resumes)} session resume(s) at "
          f"{sorted(it for it, _ in resumes)}\n\n" + "\n".join(lines) + "\n")
    if args.out:
        with open(args.out, "w") as f:
            f.write(md)
        print(f"wrote {args.out}")
    else:
        print(md)


if __name__ == "__main__":
    main()
