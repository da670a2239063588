"""Golden oracle: a straight-line pure-Python mirror of the reference's
post-processing semantics, used ONLY to generate expected outputs for
tests (comparator pattern, mlx_port/tests/test_utils.py:78-160 analogue).

``oracle_pdf_doc`` mirrors run_dpsk_ocr_pdf.py:286-320 statement-for-
statement (EOS drop, re_match, replace-all media rewrite with skipped
duplicate indices, layout strip, the normalization chain that only runs
inside the other-match loop, page-split join, jdx over kept pages only).

``oracle_spans_doc`` defines the engine's semantics over the input_hint
interleaved span table (FIXTURES.md §2).

Deliberately NOT shared with the Spark implementation — two independent
implementations is the point.
"""

from __future__ import annotations

import ast
import re

REF_RE = re.compile(r"(<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>)", re.DOTALL)
DET_OK_RE = re.compile(r"^\s*\[\s*(\[\s*\d+\s*(,\s*\d+\s*){3}\]\s*,?\s*)+\]\s*$")
EOS = "<｜end▁of▁sentence｜>"
PAGE_SPLIT = "\n<--- Page Split --->"
MEDIA_MD_RE = re.compile(r"!\[\]\((images/[0-9_]+\.jpg)\)\n")


def _split_spans(clean_text: str) -> list[dict]:
    """Decompose assembled clean text into interleaved ordered spans."""
    spans: list[dict] = []
    pos = 0
    for m in MEDIA_MD_RE.finditer(clean_text):
        if m.start() > pos:
            spans.append(
                {"kind": "text", "text": clean_text[pos : m.start()], "media_ref": None}
            )
        spans.append({"kind": "media", "text": m.group(0), "media_ref": m.group(1)})
        pos = m.end()
    if pos < len(clean_text):
        spans.append({"kind": "text", "text": clean_text[pos:], "media_ref": None})
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


def oracle_pdf_doc(pages: list[str], skip_repeat: bool = True) -> dict:
    """Reference-semantics post-process of one document's page outputs."""
    contents = ""
    contents_det = ""
    jdx = 0
    pages_kept = 0
    parse_failures = 0
    blocks_dropped = 0
    for content in pages:
        if EOS in content:
            content = content.replace(EOS, "")
        else:
            if skip_repeat:
                continue
        contents_det += content + f"\n{PAGE_SPLIT}\n"
        matches = REF_RE.findall(content)
        matches_image = [m[0] for m in matches if "<|ref|>image<|/ref|>" in m[0]]
        matches_other = [m[0] for m in matches if "<|ref|>image<|/ref|>" not in m[0]]
        for m in matches:
            try:
                ast.literal_eval(m[2])
            except Exception:
                parse_failures += 1
        for idx, a in enumerate(matches_image):
            content = content.replace(a, f"![](images/{jdx}_{idx}.jpg)\n")
        for idx, a in enumerate(matches_other):
            content = (
                content.replace(a, "")
                .replace("\\coloneqq", ":=")
                .replace("\\eqqcolon", "=:")
                .replace("\n\n\n\n", "\n\n")
                .replace("\n\n\n", "\n\n")
            )
        blocks_dropped += len(matches_other)
        contents += content + f"\n{PAGE_SPLIT}\n"
        jdx += 1
        pages_kept += 1
    spans = _split_spans(contents)
    media_spans = sum(1 for s in spans if s["kind"] == "media")
    return {
        "clean_text": contents,
        "det_text": contents_det,
        "spans": spans,
        "metrics": {
            "pages_in": len(pages),
            "pages_kept": pages_kept,
            "parse_failures": parse_failures,
            "blocks_dropped": blocks_dropped,
            "media_spans": media_spans,
            "char_yield": len(contents),
        },
    }


def oracle_ngram_ban(
    tokens: list[str],
    ngram_size: int,
    window_size: int,
    whitelist: frozenset[str] = frozenset(),
) -> list[int]:
    """Statement-level port of the reference's windowed no-repeat-ngram
    processor (process/ngram_norepeat.py:18-40) applied to a static
    token sequence under teacher forcing: returns the 0-based positions
    t whose token the processor would have banned at decode step t
    (history = tokens[:t], candidate = tokens[t])."""
    banned_positions: list[int] = []
    for t in range(len(tokens)):
        input_ids = tokens[:t]
        if len(input_ids) < ngram_size:
            continue
        current_prefix = tuple(input_ids[-(ngram_size - 1):])
        search_start = max(0, len(input_ids) - window_size)
        search_end = len(input_ids) - ngram_size + 1
        banned: set[str] = set()
        for i in range(search_start, search_end):
            ngram = tuple(input_ids[i : i + ngram_size])
            if ngram[:-1] == current_prefix:
                banned.add(ngram[-1])
        banned -= whitelist
        if tokens[t] in banned:
            banned_positions.append(t)
    return banned_positions


# ---------------------------------------------------------------------------
# spans-input pipeline oracle (engine semantics over input_hint shape)
# ---------------------------------------------------------------------------

BOILER_KINDS = {"footer", "nav"}


_COLLAPSE_RE = re.compile(r"((?:[^ ]+ ){4})(?:\1)+")


def _collapse_repeats(text: str) -> str:
    """Collapse consecutive runs of a repeated 4-word phrase down to 2
    occurrences (span-level adaptation of F1, process/ngram_norepeat.py:7-40:
    bounded-window repetition suppression); <td>-bearing text is whitelisted
    (the token-id whitelist at ngram_norepeat.py:33)."""
    if "<td>" in text or "</td>" in text:
        return text
    return _COLLAPSE_RE.sub(r"\1\1", text)


def _normalize(text: str) -> str:
    text = text.replace("\\coloneqq", ":=").replace("\\eqqcolon", "=:")
    text = text.replace("<center>", "").replace("</center>", "")
    while "\n\n\n" in text:
        text = text.replace("\n\n\n\n", "\n\n").replace("\n\n\n", "\n\n")
    return text


def oracle_spans_doc(spans: list[dict]) -> dict:
    """Engine semantics over one input_hint document (FIXTURES.md §2):
    media-ref resolution in offset order, boilerplate drop, grounding
    strip, normalize, repetition collapse, drop-empty, re-offset."""
    out: list[dict] = []
    media_idx = 0
    parse_failures = 0
    blocks_dropped = 0
    for s in sorted(spans, key=lambda s: s["offset"]):
        kind, text = s["kind"], s["text"] or ""
        for m in REF_RE.finditer(text):
            # span-pipeline semantics: a well-formed det is a bracketed
            # list of 4-int boxes (DET_OK). Deliberate deviation from the
            # reference's eval() (run_dpsk_ocr_pdf.py:143), which accepts
            # any Python literal — an artifact of eval, not a contract;
            # pipeline A (oracle_pdf_doc) keeps the faithful
            # literal_eval because its engine side is a Python UDF.
            if DET_OK_RE.search(m.group(3)) is None:
                parse_failures += 1
        if kind == "image":
            ref = f"images/{media_idx}.jpg"
            out.append({"kind": "media", "text": f"![]({ref})\n", "media_ref": ref})
            media_idx += 1
            continue
        if kind in BOILER_KINDS:
            blocks_dropped += 1
            continue
        text = REF_RE.sub("", text)
        text = _normalize(text)
        text = _collapse_repeats(text)
        if re.search(r"\S", text) is None:  # whitespace-only (unicode)
            blocks_dropped += 1
            continue
        out.append({"kind": kind, "text": text, "media_ref": None})
    for i, s in enumerate(out):
        s["offset"] = i
    return {
        "spans": out,
        "metrics": {
            "parse_failures": parse_failures,
            "blocks_dropped": blocks_dropped,
            "media_spans": media_idx,
            "blocks_kept": len(out),
            "char_yield": sum(len(s["text"]) for s in out),
        },
    }
