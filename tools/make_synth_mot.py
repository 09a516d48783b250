#!/usr/bin/env python3
"""Generate a synthetic MOT-format tracking benchmark (SYNMOT).

Real MOT17/CrowdHuman data cannot be shipped with the repo, so this tool
renders a controllable stand-in with TRUE inter-frame motion (the
image-dataset training path only fakes motion via crop jitter, mirroring
the reference's SiamVideoMotionAugment): textured sprites with stable
per-identity appearance move over a drifting textured background, bounce
off walls, occlude each other, and change scale.  Frames + gt.txt are
written in the raw MOT layout (seqinfo.ini / img1/*.jpg / gt/gt.txt) so
the standard ingestion path (`siammot_tpu.data.ingestion.ingest_mot`,
mirroring reference ``data/ingestion/ingest_mot.py``) and the video
training/eval stack consume it unchanged.

Usage:
  python tools/make_synth_mot.py --root /tmp/SYNMOT \
      [--train-seqs 8] [--test-seqs 2] [--frames 150] [--size 640 384]

Then:
  python -m siammot_tpu.data.ingestion.ingest_mot --root /tmp/SYNMOT
"""

import argparse
import configparser
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _texture(rng, h, w, scale=8, base=None):
    """Smooth random RGB texture via low-res noise upsampled bilinearly."""
    import cv2
    lo = rng.randint(0, 255, (max(2, h // scale), max(2, w // scale), 3),
                     np.uint8)
    tex = cv2.resize(lo, (w, h), interpolation=cv2.INTER_LINEAR)
    if base is not None:
        tex = (0.5 * tex + 0.5 * np.asarray(base)).astype(np.uint8)
    return tex


class Sprite:
    """A person-like textured blob with constant-velocity + noise motion."""

    def __init__(self, rng, sid, w, h):
        self.id = sid
        self.h = float(rng.uniform(0.12, 0.42) * h)
        self.w = self.h * rng.uniform(0.32, 0.52)          # person aspect
        self.x = rng.uniform(0, w - self.w)
        self.y = rng.uniform(0, h - self.h)
        speed = rng.uniform(1.0, 6.0)
        ang = rng.uniform(0, 2 * np.pi)
        self.vx = speed * np.cos(ang)
        self.vy = speed * np.sin(ang)
        self.scale_rate = rng.uniform(-0.004, 0.004)
        # stable identity texture: bright distinctive pattern + dark edge
        th, tw = max(8, int(self.h)), max(4, int(self.w))
        base = rng.randint(64, 255, (3,))
        self.tex = _texture(rng, th, tw, scale=4, base=base)
        self.tex[0, :] = self.tex[-1, :] = 16
        self.tex[:, 0] = self.tex[:, -1] = 16
        # elliptical support
        yy, xx = np.mgrid[0:th, 0:tw]
        cy, cx = (th - 1) / 2, (tw - 1) / 2
        self.mask = (((yy - cy) / (th / 2)) ** 2
                     + ((xx - cx) / (tw / 2)) ** 2) <= 1.0

    def step(self, rng, w, h):
        self.x += self.vx
        self.y += self.vy
        self.vx += rng.uniform(-0.3, 0.3)
        self.vy += rng.uniform(-0.3, 0.3)
        self.vx = np.clip(self.vx, -7, 7)
        self.vy = np.clip(self.vy, -7, 7)
        grow = 1.0 + self.scale_rate
        self.w *= grow
        self.h *= grow
        if self.x < 0:
            self.x, self.vx = 0, abs(self.vx)
        if self.y < 0:
            self.y, self.vy = 0, abs(self.vy)
        if self.x + self.w > w:
            self.x, self.vx = w - self.w, -abs(self.vx)
        if self.y + self.h > h:
            self.y, self.vy = h - self.h, -abs(self.vy)

    def draw(self, frame):
        import cv2
        x0, y0 = int(round(self.x)), int(round(self.y))
        bw, bh = max(2, int(round(self.w))), max(2, int(round(self.h)))
        x0 = min(max(x0, 0), frame.shape[1] - bw)
        y0 = min(max(y0, 0), frame.shape[0] - bh)
        tex = cv2.resize(self.tex, (bw, bh),
                         interpolation=cv2.INTER_LINEAR)
        mask = cv2.resize(self.mask.astype(np.uint8), (bw, bh),
                          interpolation=cv2.INTER_NEAREST).astype(bool)
        region = frame[y0:y0 + bh, x0:x0 + bw]
        region[mask] = tex[mask]
        return x0, y0, bw, bh


def render_sequence(seq_dir, rng, n_frames, w, h, n_sprites, fps=10):
    import cv2
    img_dir = os.path.join(seq_dir, "img1")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "gt"), exist_ok=True)

    bg = _texture(rng, h + 64, w + 64, scale=16)
    bvx, bvy = rng.uniform(-0.5, 0.5, 2)          # camera drift
    bx, by = 32.0, 32.0

    sprites = [Sprite(rng, sid + 1, w, h) for sid in range(n_sprites)]
    rows = []
    for f in range(1, n_frames + 1):
        bx = np.clip(bx + bvx, 0, 64)
        by = np.clip(by + bvy, 0, 64)
        frame = bg[int(by):int(by) + h, int(bx):int(bx) + w].copy()
        # far-to-near draw order so bigger sprites occlude smaller ones
        order = sorted(sprites, key=lambda s: s.h)
        drawn = {}
        for s in order:
            drawn[s.id] = s.draw(frame)
        # visibility: fraction not covered by later-drawn sprites
        for i, s in enumerate(order):
            x0, y0, bw, bh = drawn[s.id]
            cover = np.zeros((bh, bw), bool)
            for t in order[i + 1:]:
                tx, ty, tw_, th_ = drawn[t.id]
                ix0, iy0 = max(x0, tx), max(y0, ty)
                ix1 = min(x0 + bw, tx + tw_)
                iy1 = min(y0 + bh, ty + th_)
                if ix1 > ix0 and iy1 > iy0:
                    cover[iy0 - y0:iy1 - y0, ix0 - x0:ix1 - x0] = True
            vis = 1.0 - cover.mean()
            rows.append(f"{f},{s.id},{x0},{y0},{bw},{bh},1,1,{vis:.2f}")
        # mild sensor noise so the detector can't key on exact values
        noise = rng.randint(-6, 7, frame.shape, np.int16)
        frame = np.clip(frame.astype(np.int16) + noise, 0, 255)
        cv2.imwrite(os.path.join(img_dir, f"{f:06d}.jpg"),
                    frame.astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        for s in sprites:
            s.step(rng, w, h)

    with open(os.path.join(seq_dir, "gt", "gt.txt"), "w") as fh:
        fh.write("\n".join(rows))
    cp = configparser.ConfigParser()
    cp["Sequence"] = dict(name=os.path.basename(seq_dir), imDir="img1",
                          frameRate=str(fps), seqLength=str(n_frames),
                          imWidth=str(w), imHeight=str(h), imExt=".jpg")
    with open(os.path.join(seq_dir, "seqinfo.ini"), "w") as fh:
        cp.write(fh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--train-seqs", type=int, default=8)
    ap.add_argument("--test-seqs", type=int, default=2)
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--size", type=int, nargs=2, default=(640, 384),
                    metavar=("W", "H"))
    ap.add_argument("--sprites", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    w, h = args.size
    rng = np.random.RandomState(args.seed)
    for split, count in (("train", args.train_seqs), ("test",
                                                      args.test_seqs)):
        for i in range(count):
            name = f"SYN-{split[:2].upper()}-{i + 1:02d}"
            seq_dir = os.path.join(args.root, split, name)
            n_sp = int(rng.randint(max(2, args.sprites - 2),
                                   args.sprites + 3))
            render_sequence(seq_dir, rng, args.frames, w, h, n_sp)
            print(f"{name}: {args.frames} frames, {n_sp} sprites")
    print(f"done -> {args.root}  (now run: python -m "
          f"siammot_tpu.data.ingestion.ingest_mot --root {args.root})")


if __name__ == "__main__":
    main()
