"""Host-side image preprocessing (CLIP-style) in PIL/numpy.

Rebuilds the reference's CLIPImageProcessor path plus LLaVA's pad-to-square
(reference: modelcompose/mm_utils.py:14-40): resize shortest side (bicubic),
center crop, rescale 1/255, normalize.  Pure host code feeding the device
with pre-normalized [B, H, W, 3] float arrays (NHWC — TPU conv layout).
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..models.vision_clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


class ClipImageProcessor:
    """Semantics of HF CLIPImageProcessor for the openai CLIP checkpoints."""

    def __init__(self, size: int = 336,
                 mean: Sequence[float] = CLIP_IMAGE_MEAN,
                 std: Sequence[float] = CLIP_IMAGE_STD):
        self.size = size
        self.image_mean = tuple(mean)
        self.image_std = tuple(std)

    def _resize_shortest(self, img: Image.Image) -> Image.Image:
        w, h = img.size
        short, long = (w, h) if w <= h else (h, w)
        new_short = self.size
        # HF get_resize_output_image_size TRUNCATES the long side
        # (int(new_short * long / short), not round) — e.g. 640x427 ->
        # 503, where round() gives 504 and shifts the center crop a pixel
        new_long = int(long * new_short / short)
        nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
        return img.resize((nw, nh), Image.BICUBIC)

    def _center_crop(self, img: Image.Image) -> Image.Image:
        w, h = img.size
        left = (w - self.size) // 2
        top = (h - self.size) // 2
        return img.crop((left, top, left + self.size, top + self.size))

    def __call__(self, images) -> np.ndarray:
        """images: PIL image or iterable of them -> [B, size, size, 3]
        normalized float32 (NHWC)."""
        if isinstance(images, Image.Image):
            images = [images]
        out = []
        mean = np.asarray(self.image_mean, np.float32)
        std = np.asarray(self.image_std, np.float32)
        for img in images:
            if img.mode != "RGB":
                img = img.convert("RGB")
            img = self._center_crop(self._resize_shortest(img))
            arr = np.asarray(img, np.float32) / 255.0
            out.append((arr - mean) / std)
        return np.stack(out)


def expand2square(img: Image.Image,
                  background_color: Tuple[int, ...]) -> Image.Image:
    """Pad to square with the dataset image mean (reference:
    mm_utils.py:14-25)."""
    w, h = img.size
    if w == h:
        return img
    side = max(w, h)
    result = Image.new(img.mode, (side, side), background_color)
    result.paste(img, ((side - w) // 2 if h > w else 0,
                       (side - h) // 2 if w > h else 0))
    return result


def process_images(images: Iterable[Image.Image],
                   image_processor: ClipImageProcessor,
                   image_aspect_ratio: Optional[str] = None) -> np.ndarray:
    """reference: mm_utils.py:28-40."""
    if image_aspect_ratio == "pad":
        bg = tuple(int(x * 255) for x in image_processor.image_mean)
        images = [expand2square(img, bg) for img in images]
    return image_processor(list(images))
