#!/usr/bin/env python3
"""Wide randomized parity battery: ~400 seeded-random texts composed of PII
values, CJK/ASCII filler, punctuation, adjacency and boundary cases, run
through the reference's golden path (detect → resolve → replace/blackbox).
"""
import json
import os
import random
import sys
import hashlib

sys.path.insert(0, "/root/reference/src")
os.environ.setdefault("USE_STUB", "true")

from deid_pipeline.pii.detectors import get_detector  # noqa: E402
from deid_pipeline.pii.utils.replacer import Replacer  # noqa: E402

PII = [
    "A123456789", "a123456789", "B234567890", "0912345678", "0912-345-678",
    "0987-654-321", "test@example.com", "a@b.com", "x.y-z@sub.domain.org",
    "M1234567", "M12345678", "PA1234567", "P1234567", "12345678", "87654321",
    "123-45-6789", "+1-555-123-4567", "(555) 123-4567", "123 Main Street",
    "45 Oak Avenue", "台北市信義路1號", "新北市板橋區文化路一段100號", "5樓",
    "12樓之3", "高雄市中正路99號", "基隆市中正區中正里三鄰10號",
    "大安區和平東路二段106巷5弄2號", "信義路五段7號", "台北101大樓",
]
FILLER = [
    "hello", "world", "the", "order", "確認", "病歷", "電話", "聯絡", "資料",
    "ok", "done", "x", "-", "--", ".", ",", "，", "。", ";", "\n", "\t",
    "  ", "(", ")", "[", "]", "<", ">", "@", "#", "123", "12", "09",
    "AB", "Z", "號", "路", "市", "😀", "™", "１２３",
]

rng = random.Random(2024)
texts = []
for _ in range(380):
    parts = []
    for _ in range(rng.randint(0, 14)):
        if rng.random() < 0.4:
            parts.append(rng.choice(PII))
        else:
            parts.append(rng.choice(FILLER))
        if rng.random() < 0.7:
            parts.append(rng.choice([" ", "", "  ", "\n"]))
    texts.append("".join(parts))
# adjacency torture: PII back-to-back with no separators
for _ in range(40):
    texts.append("".join(rng.choice(PII) for _ in range(rng.randint(2, 6))))

# documents from the reference's own synthetic-corpus factory
# (sensitive_data_generator, ported as graft.training.SensitiveDataGen):
# realistic medical/financial/paragraph documents with format-valid zh PII,
# generated seeded + frozen-now so both engines see identical inputs
import types
import datetime as _dt
sys.path.insert(0, "/root/reference")
_pil = types.ModuleType("PIL")
for _sub in ("Image", "ImageDraw", "ImageFont"):
    _m = types.ModuleType(f"PIL.{_sub}")
    setattr(_pil, _sub, _m)
    sys.modules[f"PIL.{_sub}"] = _m
sys.modules["PIL"] = _pil
import sensitive_data_generator.generators as _G  # noqa: E402
import sensitive_data_generator.formatters as _F  # noqa: E402


class _FrozenDT(_dt.datetime):
    @classmethod
    def now(cls, tz=None):
        return cls(2026, 1, 15, 12, 0, 0)


_G.datetime = _FrozenDT
_F.datetime = _FrozenDT
for _seed in range(30):
    random.seed(5000 + _seed)
    texts.append(_F.DataFormatter.generate_random_document())

out = []
for lang in ("zh", "en"):
    det = get_detector(lang)
    rep = Replacer()
    for text in texts:
        raw = det.detect(text)
        ctx = hashlib.sha256(text.encode("utf-8", errors="replace")).hexdigest()
        for mode in ("replace", "blackbox"):
            clean, _ = rep.replace(text, raw, mode=mode, context_hash=ctx)
            out.append({
                "lang": lang, "mode": mode, "text": text, "clean": clean,
                "spans": [[int(e["span"][0]), int(e["span"][1]), e["type"]]
                          for e in raw],
            })

with open("/root/repo/src/test/resources/golden_deid_wide.json", "w") as f:
    json.dump(out, f, ensure_ascii=False)
print("cases:", len(out))
