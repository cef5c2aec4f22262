#!/usr/bin/env python
"""Assemble image sequences into a video.

Behavioral spec: create_video_frm_images.py / create_video_frm_images_list.py
in the reference (moviepy ImageSequenceClip -> mp4). Implemented over
imageio (mp4 when an ffmpeg backend is present, GIF fallback via PIL).

Usage:
  python cli/make_video.py --images dir/ --out out.mp4 --fps 24
  python cli/make_video.py --list frames.txt --out out.gif
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def collect_frames(images=None, list_file=None):
    if list_file:
        with open(list_file) as f:
            return [line.strip() for line in f if line.strip()]
    exts = ("*.png", "*.jpg", "*.jpeg")
    files = []
    for e in exts:
        files += glob.glob(os.path.join(images, e))
    return sorted(files)


def write_video(frames, out, fps=24):
    assert frames, "no frames"
    if out.lower().endswith(".gif"):
        from PIL import Image
        imgs = [Image.open(f).convert("RGB") for f in frames]
        imgs[0].save(out, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
        return out
    try:
        import imageio.v2 as imageio
        with imageio.get_writer(out, fps=fps) as writer:
            for f in frames:
                writer.append_data(imageio.imread(f))
        return out
    except Exception as e:
        alt = os.path.splitext(out)[0] + ".gif"
        print(f"mp4 backend unavailable ({type(e).__name__}); writing {alt}")
        return write_video(frames, alt, fps)


def main():
    from morphganformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description="Images -> video")
    p.add_argument("--images", help="Directory of frames")
    p.add_argument("--list", dest="list_file", help="Text file of frame paths")
    p.add_argument("--out", required=True)
    p.add_argument("--fps", type=int, default=24)
    args = p.parse_args()
    frames = collect_frames(args.images, args.list_file)
    out = write_video(frames, args.out, args.fps)
    print(f"{len(frames)} frames -> {out}")


if __name__ == "__main__":
    main()
