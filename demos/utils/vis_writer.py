"""Visualization output writer.

Counterpart of ``/root/reference/demos/utils/vis_writer.py:7-66``: frame
dump directory and/or an mp4 via cv2's VideoWriter (the reference shells
out to ffmpeg for an x264 recompress; cv2's bundled FFmpeg writes the
file directly here).
"""

from __future__ import annotations

import os

import cv2


class VisWriter:
    def __init__(self, dump_video: bool = False, out_path: str = ".",
                 file_name: str = "demo", fps: float = 30.0):
        self.dump_video = dump_video
        self.out_path = out_path
        self.file_name = os.path.splitext(os.path.basename(file_name))[0]
        self.fps = fps
        self._writer = None
        os.makedirs(out_path, exist_ok=True)
        if not dump_video:
            self.frame_dir = os.path.join(out_path, self.file_name + "_frames")
            os.makedirs(self.frame_dir, exist_ok=True)

    def dump_artifacts(self, frame, frame_id: int):
        """frame: BGR uint8."""
        if self.dump_video:
            if self._writer is None:
                h, w = frame.shape[:2]
                path = os.path.join(self.out_path, self.file_name + ".mp4")
                self._writer = cv2.VideoWriter(
                    path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps, (w, h))
            self._writer.write(frame)
        else:
            cv2.imwrite(os.path.join(self.frame_dir,
                                     f"{frame_id:06d}.jpg"), frame)

    def close(self):
        if self._writer is not None:
            self._writer.release()
            self._writer = None
