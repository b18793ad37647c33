"""Write image sequences to video (reference implicitron/tools/video_writer.py).

ffmpeg may be absent; falls back to an animated GIF via PIL.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Optional

import numpy as np


class VideoWriter:
    def __init__(
        self,
        fps: int = 20,
        output_format: str = "visdom",
        rmdir_allowed: bool = False,
        out_path: str = "/tmp/video.mp4",
        **kwargs,
    ) -> None:
        self.fps = fps
        self.out_path = out_path
        self.frames = []
        self.cache_dir = tempfile.mkdtemp("video_writer")

    def write_frame(self, frame, resize=None) -> None:
        """frame: (H, W, 3) float [0,1] or uint8 array."""
        arr = np.asarray(frame)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        if resize is not None:
            from PIL import Image

            arr = np.asarray(
                Image.fromarray(arr).resize((resize[1], resize[0]))
            )
        self.frames.append(arr)

    def get_video(self, quiet: bool = True) -> str:
        if not self.frames:
            raise ValueError("No frames written")
        if shutil.which("ffmpeg") and self.out_path.endswith(".mp4"):
            from PIL import Image

            for i, f in enumerate(self.frames):
                Image.fromarray(f).save(
                    os.path.join(self.cache_dir, "frame_%06d.png" % i)
                )
            cmd = [
                "ffmpeg", "-y", "-framerate", str(self.fps),
                "-i", os.path.join(self.cache_dir, "frame_%06d.png"),
                "-pix_fmt", "yuv420p", self.out_path,
            ]
            subprocess.run(
                cmd,
                check=True,
                stdout=subprocess.DEVNULL if quiet else None,
                stderr=subprocess.DEVNULL if quiet else None,
            )
        else:
            from PIL import Image

            out = (
                self.out_path
                if self.out_path.endswith(".gif")
                else self.out_path.rsplit(".", 1)[0] + ".gif"
            )
            imgs = [Image.fromarray(f) for f in self.frames]
            imgs[0].save(
                out, save_all=True, append_images=imgs[1:],
                duration=int(1000 / self.fps), loop=0,
            )
            self.out_path = out
        return self.out_path
