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


class Camera:
    """Smooth pan/zoom camera over a world rectangle (MOT17 sequences mix
    static and moving cameras; the hard preset models the moving ones).

    World->image: ``x_img = (x_world - view_x0) * zoom`` where the view
    rectangle has size (w/zoom, h/zoom) centered at (cx, cy)."""

    def __init__(self, rng, w, h, world_w, world_h):
        self.w, self.h = w, h
        self.world_w, self.world_h = world_w, world_h
        self.cx = rng.uniform(w * 0.6, world_w - w * 0.6)
        self.cy = rng.uniform(h * 0.6, world_h - h * 0.6)
        self.vx, self.vy = rng.uniform(-1.5, 1.5, 2)
        self.zoom = rng.uniform(0.9, 1.05)
        self.zrate = rng.uniform(-0.002, 0.002)

    def step(self, rng):
        self.vx = np.clip(self.vx + rng.uniform(-0.2, 0.2), -3.0, 3.0)
        self.vy = np.clip(self.vy + rng.uniform(-0.15, 0.15), -2.0, 2.0)
        self.zrate = np.clip(self.zrate + rng.uniform(-0.0006, 0.0006),
                             -0.004, 0.004)
        self.zoom = float(np.clip(self.zoom * (1 + self.zrate), 0.85, 1.2))
        vw, vh = self.w / self.zoom, self.h / self.zoom
        self.cx = float(np.clip(self.cx + self.vx, vw / 2,
                                self.world_w - vw / 2))
        self.cy = float(np.clip(self.cy + self.vy, vh / 2,
                                self.world_h - vh / 2))

    def view_origin(self):
        return (self.cx - self.w / (2 * self.zoom),
                self.cy - self.h / (2 * self.zoom))

    def project(self, x, y, bw, bh):
        x0, y0 = self.view_origin()
        z = self.zoom
        return (x - x0) * z, (y - y0) * z, bw * z, bh * z


class WorldSprite:
    """Pedestrian-like sprite living in world coordinates.

    Walks with smoothly-varying heading and occasional pauses
    (static_person), bounces at *world* edges (so it freely enters/leaves
    the camera frame -> amodal truncation), and slowly changes scale
    (depth motion)."""

    def __init__(self, rng, sid, world_w, world_h, frame_h):
        self.id = sid
        self.h = float(rng.uniform(0.07, 0.38) * frame_h)
        self.w = self.h * rng.uniform(0.32, 0.52)
        self.x = rng.uniform(0, world_w - self.w)
        self.y = rng.uniform(0, world_h - self.h)
        self.speed = rng.uniform(0.3, 2.5)
        self.heading = rng.uniform(0, 2 * np.pi)
        self.scale_rate = rng.uniform(-0.003, 0.003)
        self.paused = 0
        base = rng.randint(64, 255, (3,))
        th, tw = max(8, int(self.h)), max(4, int(self.w))
        self.tex = _texture(rng, th, tw, scale=4, base=base)
        self.tex[0, :] = self.tex[-1, :] = 16
        self.tex[:, 0] = self.tex[:, -1] = 16
        yy, xx = np.mgrid[0:th, 0:tw]
        cy, cx = (th - 1) / 2, (tw - 1) / 2
        self.mask = (((yy - cy) / (th / 2)) ** 2
                     + ((xx - cx) / (tw / 2)) ** 2) <= 1.0

    def step(self, rng, world_w, world_h):
        if self.paused > 0:
            self.paused -= 1
        else:
            if rng.rand() < 0.01:
                self.paused = rng.randint(10, 60)
            self.heading += rng.uniform(-0.15, 0.15)
            self.x += self.speed * np.cos(self.heading)
            self.y += 0.5 * self.speed * np.sin(self.heading)
        grow = 1.0 + self.scale_rate
        self.w *= grow
        self.h *= grow
        if self.x < 0 or self.x + self.w > world_w:
            self.heading = np.pi - self.heading
            self.x = np.clip(self.x, 0, world_w - self.w)
        if self.y < 0 or self.y + self.h > world_h:
            self.heading = -self.heading
            self.y = np.clip(self.y, 0, world_h - self.h)


class Occluder:
    """Static world-space pillar drawn in FRONT of every sprite: a sprite
    walking behind it disappears for many consecutive frames (the
    long-occlusion / dormant-resume regime of MOT17)."""

    def __init__(self, rng, world_w, world_h, frame_w, frame_h):
        self.w = rng.uniform(0.04, 0.08) * frame_w
        self.h = rng.uniform(0.5, 1.0) * frame_h
        self.x = rng.uniform(0, world_w - self.w)
        self.y = rng.uniform(0, world_h - self.h)
        self.tex = _texture(rng, max(8, int(self.h)), max(4, int(self.w)),
                            scale=6, base=(40, 40, 48))


def _paint(frame, owner, code, tex, mask, xi, yi, bwf, bhf):
    """Draw a projected box (possibly off-frame) into frame + owner buffer.

    Returns the amodal integer image-space box (x, y, w, h) — which may
    extend beyond the frame, exactly like MOT17 amodal GT."""
    import cv2
    h, w = frame.shape[:2]
    x0, y0 = int(round(xi)), int(round(yi))
    bw, bh = max(2, int(round(bwf))), max(2, int(round(bhf)))
    dx0, dy0 = max(0, x0), max(0, y0)
    dx1, dy1 = min(w, x0 + bw), min(h, y0 + bh)
    if dx1 <= dx0 or dy1 <= dy0:
        return (x0, y0, bw, bh)
    tex_r = cv2.resize(tex, (bw, bh), interpolation=cv2.INTER_LINEAR)
    if mask is None:
        mask_r = np.ones((bh, bw), bool)
    else:
        mask_r = cv2.resize(mask.astype(np.uint8), (bw, bh),
                            interpolation=cv2.INTER_NEAREST).astype(bool)
    sx0, sy0 = dx0 - x0, dy0 - y0
    sub_m = mask_r[sy0:sy0 + (dy1 - dy0), sx0:sx0 + (dx1 - dx0)]
    sub_t = tex_r[sy0:sy0 + (dy1 - dy0), sx0:sx0 + (dx1 - dx0)]
    region = frame[dy0:dy1, dx0:dx1]
    region[sub_m] = sub_t[sub_m]
    owner[dy0:dy1, dx0:dx1][sub_m] = code
    return (x0, y0, bw, bh)


def simulate_public_detector(rng, boxes_vis, w, h):
    """DPM-style noisy public detections from GT: misses scale with
    occlusion and small size, boxes are jittered, plus random false
    positives (MOT17's public detections are exactly this kind of noisy
    per-frame detector output)."""
    dets = []
    for (x, y, bw, bh), vis in boxes_vis:
        if vis < 0.25:
            continue
        p_det = min(0.97, 0.25 + 0.75 * vis) * min(1.0, bh / 28.0)
        if rng.rand() > p_det:
            continue
        jx = x + rng.normal(0, 0.05) * bw
        jy = y + rng.normal(0, 0.05) * bh
        jw = bw * np.exp(rng.normal(0, 0.08))
        jh = bh * np.exp(rng.normal(0, 0.08))
        # public detectors see pixels: clip to the frame
        x0, y0 = max(0.0, jx), max(0.0, jy)
        x1, y1 = min(float(w), jx + jw), min(float(h), jy + jh)
        if x1 - x0 < 2 or y1 - y0 < 2:
            continue
        conf = float(np.clip(vis * rng.normal(1.0, 0.15), 0.05, 1.0))
        dets.append((x0, y0, x1 - x0, y1 - y0, conf))
    for _ in range(rng.poisson(0.5)):
        fw = rng.uniform(8, 0.2 * w)
        fh = fw * rng.uniform(1.8, 3.0)
        fx = rng.uniform(0, w - fw)
        fy = rng.uniform(0, max(1, h - fh))
        dets.append((fx, fy, fw, min(fh, h - fy),
                     float(rng.uniform(0.05, 0.45))))
    return dets


def render_sequence_hard(seq_dir, rng, n_frames, w, h, n_sprites, fps=30):
    """MOT17-statistics sequence: crowded (tens of instances), moving
    pan/zoom camera, amodal border truncation, pillar occluders giving
    long (>MAX_DORMANT-scale) occlusions, and a simulated noisy public
    detector written to det/det.txt."""
    import cv2
    img_dir = os.path.join(seq_dir, "img1")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "gt"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "det"), exist_ok=True)

    # modest world margin: sprites do truncate at borders, but MOT17-like
    # visibility stats need most instances on-frame most of the time
    world_w, world_h = int(w * 1.25), int(h * 1.15)
    bg = _texture(rng, world_h, world_w, scale=24)
    cam = Camera(rng, w, h, world_w, world_h)
    sprites = [WorldSprite(rng, sid + 1, world_w, world_h, h)
               for sid in range(n_sprites)]
    occluders = [Occluder(rng, world_w, world_h, w, h)
                 for _ in range(rng.randint(1, 4))]

    gt_rows, det_rows = [], []
    for f in range(1, n_frames + 1):
        cam.step(rng)
        z = cam.zoom
        x0v, y0v = cam.view_origin()
        M = np.float32([[z, 0, -z * x0v], [0, z, -z * y0v]])
        frame = cv2.warpAffine(bg, M, (w, h), flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_REFLECT)
        owner = np.full((h, w), -1, np.int32)

        order = sorted(sprites, key=lambda s: s.h)   # far -> near
        amodal = {}
        for s in order:
            xi, yi, bwf, bhf = cam.project(s.x, s.y, s.w, s.h)
            amodal[s.id] = _paint(frame, owner, s.id, s.tex, s.mask,
                                  xi, yi, bwf, bhf)
        for i, oc in enumerate(occluders):
            xi, yi, bwf, bhf = cam.project(oc.x, oc.y, oc.w, oc.h)
            _paint(frame, owner, -2 - i, oc.tex, None, xi, yi, bwf, bhf)

        # visibility = unoccluded on-frame fraction of the AMODAL box
        counts = np.bincount(owner[owner >= 0].ravel(),
                             minlength=n_sprites + 2)
        boxes_vis = []
        for s in sprites:
            x0, y0, bw, bh = amodal[s.id]
            # GT exists only while the (amodal) box intersects the frame:
            # MOT17 annotates pedestrians in scene, not off-camera ones.
            # On-frame-but-fully-occluded rows (vis 0.00 behind a pillar)
            # ARE kept — that's the long-occlusion/dormancy regime.
            if x0 + bw <= 0 or y0 + bh <= 0 or x0 >= w or y0 >= h:
                continue
            vis = float(counts[s.id]) / float(bw * bh)
            gt_rows.append(
                f"{f},{s.id},{x0},{y0},{bw},{bh},1,1,{vis:.2f}")
            boxes_vis.append(((x0, y0, bw, bh), vis))

        for (dx, dy, dw, dh, conf) in simulate_public_detector(
                rng, boxes_vis, w, h):
            det_rows.append(f"{f},-1,{dx:.2f},{dy:.2f},{dw:.2f},{dh:.2f},"
                            f"{conf:.3f}")

        noise = rng.randint(-6, 7, frame.shape, np.int16)
        frame = np.clip(frame.astype(np.int16) + noise, 0, 255)
        cv2.imwrite(os.path.join(img_dir, f"{f:06d}.jpg"),
                    frame.astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        for s in sprites:
            s.step(rng, world_w, world_h)

    with open(os.path.join(seq_dir, "gt", "gt.txt"), "w") as fh:
        fh.write("\n".join(gt_rows))
    with open(os.path.join(seq_dir, "det", "det.txt"), "w") as fh:
        fh.write("\n".join(det_rows))
    cp = configparser.ConfigParser()
    cp["Sequence"] = dict(name=os.path.basename(seq_dir), imDir="img1",
                          frameRate=str(fps), seqLength=str(n_frames),
                          imWidth=str(w), imHeight=str(h), imExt=".jpg")
    with open(os.path.join(seq_dir, "seqinfo.ini"), "w") as fh:
        cp.write(fh)


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
    ap.add_argument("--sprites", type=int, default=None,
                    help="mean instance count (default: 6 easy, 36 hard)")
    ap.add_argument("--preset", choices=("easy", "hard"), default="easy",
                    help="hard = MOT17 statistics: crowded, pan/zoom "
                         "camera, amodal truncation, pillar occluders, "
                         "simulated public detections (VERDICT r1 #4)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    w, h = args.size
    hard = args.preset == "hard"
    mean_sp = args.sprites if args.sprites is not None else (36 if hard
                                                             else 6)
    render = render_sequence_hard if hard else render_sequence
    fps = 30 if hard else 10
    rng = np.random.RandomState(args.seed)
    for split, count in (("train", args.train_seqs), ("test",
                                                      args.test_seqs)):
        for i in range(count):
            name = f"SYN-{split[:2].upper()}-{i + 1:02d}"
            seq_dir = os.path.join(args.root, split, name)
            lo = max(2, int(mean_sp * 0.6))
            hi = max(lo + 1, int(mean_sp * 1.4))
            n_sp = int(rng.randint(lo, hi + 1))
            render(seq_dir, rng, args.frames, w, h, n_sp, fps=fps)
            print(f"{name}: {args.frames} frames, {n_sp} sprites")
    print(f"done -> {args.root}  (now run: python -m "
          f"siammot_tpu.data.ingestion.ingest_mot --root {args.root})")


if __name__ == "__main__":
    main()
