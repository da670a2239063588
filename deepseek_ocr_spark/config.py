"""Job configuration presets — the engine-side analogue of the
reference's config surface (DeepSeek-OCR-vllm/config.py:1-36 and
mlx_port/config_mlx.py:28-97).

The reference's resolution modes set (BASE_SIZE, IMAGE_SIZE, CROP_MODE)
(README.md:189-197); here they parameterize the tiling cost model and
partition sizing. Prompt templates (config.py:27-36) survive as the
task selector for the query surface (T6 'locate' ⇒ span search).
Validated at import like config_mlx.py:306-336.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Mode:
    name: str
    base_size: int
    image_size: int
    crop_mode: bool


# README.md:189-197 mode table
MODES = {
    "tiny": Mode("tiny", 512, 512, False),
    "small": Mode("small", 640, 640, False),
    "base": Mode("base", 1024, 1024, False),
    "large": Mode("large", 1280, 1280, False),
    "gundam": Mode("gundam", 1024, 640, True),
}

# config.py:27-36 task prompts → engine task names
TASKS = {
    "markdown": "document → interleaved markdown spans (flagship)",
    "ocr": "raw text only (layout spans dropped)",
    "free_ocr": "raw text without any grounding handling",
    "locate": "span search by label/needle (T6)",
    "describe": "out of scope (requires vision model)",
}

# extraction knobs (reference decode-time filter params,
# run_dpsk_ocr_pdf.py:46; adapted span-level in spans_pipeline)
SKIP_REPEAT = True
COLLAPSE_NGRAM = 4
COLLAPSE_MAX_REPEATS = 2

# scale knobs (plans/)
DEFAULT_SLICES = 16
DEFAULT_SALT_BUCKETS = 16


def validate() -> None:
    for m in MODES.values():
        assert m.base_size >= m.image_size > 0, m
        assert m.base_size % 16 == 0 and m.image_size % 16 == 0, m
    assert COLLAPSE_NGRAM > 0 and COLLAPSE_MAX_REPEATS >= 1


validate()
