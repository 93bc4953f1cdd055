"""Text labels on images.

Parity target: `third_party_model/anysplat/src/visualization/annotation.py`
(`draw_label`, `add_label`): black text on white, no border, stacked above
the image with a 4-px gap, left-aligned.  PIL renders the glyphs on the
host; the reference's bundled font asset is optional (falls back to PIL's
default, as the reference does on OSError, `annotation.py:24-26`).
"""

from __future__ import annotations

from string import ascii_letters, digits, punctuation

import numpy as np

from vist3a_tpu.viz.layout import vcat

EXPECTED_CHARACTERS = digits + punctuation + ascii_letters


def draw_label(text: str, font_path: str | None = None,
               font_size: int = 24) -> np.ndarray:
    """Render `text` black-on-white → float32 (3, height, width) in [0,1]
    (`annotation.py:16-36`).  Height comes from the full expected character
    set so labels of different strings stack at equal heights."""
    from PIL import Image, ImageDraw, ImageFont

    try:
        font = ImageFont.truetype(str(font_path), font_size)
    except (OSError, TypeError):
        font = ImageFont.load_default()
    left, _, right, _ = font.getbbox(text)
    width = max(right - left, 1)
    _, top, _, bottom = font.getbbox(EXPECTED_CHARACTERS)
    height = max(bottom - top, 1)
    image = Image.new("RGB", (width, height), color="white")
    ImageDraw.Draw(image).text((0, 0), text, font=font, fill="black")
    arr = np.asarray(image, dtype=np.float32) / 255.0
    return np.transpose(arr, (2, 0, 1))


def add_label(image: np.ndarray, label: str, font_path: str | None = None,
              font_size: int = 24) -> np.ndarray:
    """Stack a label above a (3,H,W) image (`annotation.py:39-49`)."""
    return vcat(draw_label(label, font_path, font_size),
                np.asarray(image, np.float32), align="left", gap=4)
