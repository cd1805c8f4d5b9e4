"""Dataset preparation tools (reference scripts/other/*): invalid-image
finder/fixer, json merge+shuffle, Cauldron->LLaVA conversion, multi-image /
multi-round reformatting, video-mme conversion, image checks."""

from __future__ import annotations

import json
import logging
import random
from collections import Counter
from pathlib import Path
from typing import Dict, List, Optional, Sequence

log = logging.getLogger(__name__)


def find_invalid_images(data_file: str, image_folder: str) -> List[Dict]:
    """Records whose image files are missing or unreadable
    (reference scripts/other/1_find_invalid_image.py)."""
    from PIL import Image

    records = json.load(open(data_file))
    bad = []
    for rec in records:
        if "image" not in rec:
            continue
        names = rec["image"] if isinstance(rec["image"], list) else [rec["image"]]
        for name in names:
            path = Path(image_folder) / name
            try:
                with Image.open(path) as im:
                    im.convert("RGB")
            except Exception as e:
                bad.append({"id": rec.get("id"), "image": name, "error": str(e)})
    return bad


def fix_invalid_images(data_file: str, image_folder: str, out_file: str) -> int:
    """Drop records with unreadable images (2_fix_invalid_image.py analog)."""
    bad = {b["id"] for b in find_invalid_images(data_file, image_folder)}
    records = json.load(open(data_file))
    kept = [r for r in records if r.get("id") not in bad]
    json.dump(kept, open(out_file, "w"))
    return len(records) - len(kept)


def merge_and_shuffle(json_files: Sequence[str], out_file: str, seed: int = 222) -> int:
    """Merge LLaVA-format jsons and shuffle deterministically
    (merge/shuffle tools; seed 222 matches the reference's epoch shuffles)."""
    records: List[Dict] = []
    for f in json_files:
        records.extend(json.load(open(f)))
    rng = random.Random(seed)
    rng.shuffle(records)
    json.dump(records, open(out_file, "w"))
    return len(records)


def cauldron_to_llava(cauldron_records: Sequence[Dict], image_prefix: str = "") -> List[Dict]:
    """Cauldron {images, texts:[{user, assistant}]} -> LLaVA conversations
    (Cauldron converter analog)."""
    out = []
    for i, rec in enumerate(cauldron_records):
        convs = []
        for j, turn in enumerate(rec.get("texts", [])):
            user = turn.get("user", "")
            if j == 0 and "<image>" not in user:
                user = "<image>\n" + user
            convs.append({"from": "human", "value": user})
            convs.append({"from": "gpt", "value": turn.get("assistant", "")})
        out.append(
            {
                "id": rec.get("id", f"cauldron_{i}"),
                "image": rec.get("image", rec.get("images")),
                "conversations": convs,
            }
        )
    return out


def split_multiround_to_single(records: Sequence[Dict]) -> List[Dict]:
    """Explode multi-round conversations into single-round records
    (multi-round reformatter analog); the image stays on the first round."""
    out = []
    for rec in records:
        convs = rec["conversations"]
        for i in range(0, len(convs) - 1, 2):
            sub = [dict(convs[i]), dict(convs[i + 1])]
            if i > 0:
                sub[0]["value"] = sub[0]["value"].replace("<image>", "").strip()
            new = {**rec, "conversations": sub, "id": f"{rec.get('id')}_r{i // 2}"}
            if i > 0:
                new.pop("image", None)
            out.append(new)
    return out


def videomme_to_questions(videomme_json: str, num_frames: int = 8) -> List[Dict]:
    """Video-MME records -> our eval question format with N frame tokens."""
    data = json.load(open(videomme_json))
    out = []
    for rec in data:
        for q in rec.get("questions", [rec] if "question" in rec else []):
            opts = "\n".join(q.get("options", []))
            text = ("<image>\n" * num_frames) + q["question"] + (
                f"\n{opts}" if opts else ""
            ) + "\nAnswer with the option's letter from the given choices directly."
            out.append(
                {
                    "question_id": q.get("question_id", q.get("id")),
                    "video": rec.get("video_id", rec.get("videoID", "")),
                    "text": text,
                    "answer": q.get("answer", ""),
                }
            )
    return out


def check_duplicates(data_file: str, key: str = "id") -> Dict[str, int]:
    """Duplicate-id report (check_dir_dup.py analog)."""
    records = json.load(open(data_file))
    counts = Counter(str(r.get(key)) for r in records)
    return {k: v for k, v in counts.items() if v > 1}
