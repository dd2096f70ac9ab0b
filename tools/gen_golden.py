#!/usr/bin/env python3
"""Generate golden parity fixtures by running the reference pipeline's
default (golden) path: regex-only composite detector + MT19937 fallback
replacement (faker absent), language zh + en.

Runs against /root/reference (read-only import). Output:
src/test/resources/golden_deid.json
"""
import json
import os
import sys
import hashlib

sys.path.insert(0, "/root/reference/src")
os.environ.setdefault("USE_STUB", "true")
os.environ.setdefault("USE_ONNX", "false")
os.environ.setdefault("USE_SPACY", "false")

from deid_pipeline.pii.detectors import get_detector  # noqa: E402
from deid_pipeline.pii.utils.replacer import Replacer  # noqa: E402
from deid_pipeline.core.contracts import normalize_entity, replacement_key  # noqa: E402

TEXTS = [
    # PII fixture battery (FIXTURES.md §2)
    "ID A123456789 and phone 0912345678. Email test@example.com. Address 台北市信義路1號. ",
    "Hi, my ID is A123456789 and phone 0912-345-678.",
    "Email me at test@example.com or call 0912345678.",
    "Med record M1234567 at 台北市信義路1號.",
    "Passport PA1234567 UBN 12345678 contract CN-000123.",
    "SSN 123-45-6789 call +1-555-123-4567 at 123 Main Street.",
    "台北市信義路1號 5樓 and 新北市板橋區文化路一段100號",
    "王小明住在基隆市中正區中正里三鄰10號",
    "大安區和平東路二段106巷5弄2號",
    "同一個 ID A123456789 出現兩次 A123456789 確認一致",
    "a@b.com alice@example.com bob.smith@sub.domain.org",
    "M12345678 overlaps B987654321 and PA1234567",
    "12345678 bare UBN and 87654321",
    "multiline\n0912-345-678\ntext with 09 1234 and A1",
    "",
    "no pii here at all",
    "emoji 😀 before ID A123456789 and 😀😀 phone 0912345678 end",
    "ＡＢＣ fullwidth then A123456789",
    "<html><body><p>Contact alice@example.com now.</p></body></html>",
    "X" * 50 + " A123456789 " + "Y" * 50,
    "edge at end A123456789",
    "A123456789",
    "0912345678 starts the line",
    "Ids: a123456789 lowercase (IGNORECASE rule)",
    "病歷號 M1234567，電話 0912-345-678，統編 12345678。",
    ("ID A123456789 and phone 0912345678. " * 20),
]

out = []
for lang in ("zh", "en"):
    det = get_detector(lang)
    rep = Replacer()
    for text in TEXTS:
        raw = det.detect(text)
        ctx = hashlib.sha256(text.encode("utf-8", errors="replace")).hexdigest()
        for mode in ("replace", "blackbox"):
            clean, raw_events = rep.replace(text, raw, mode=mode, context_hash=ctx)
            entities = [normalize_entity(e, language=lang, text=text) for e in raw]
            events = []
            rmap = {}
            for ev in raw_events:
                original = ev.get("original")
                replacement = ev.get("replacement") or ev.get("fake")
                etype = ev.get("type") or ev.get("entity_type")
                if original is not None and replacement is not None and etype is not None:
                    rmap[replacement_key(str(etype), str(original))] = str(replacement)
                    events.append({
                        "entity_type": str(etype),
                        "original": str(original),
                        "replacement": str(replacement),
                        "span": list(ev.get("span", (0, 0))),
                        "source": str(ev.get("source", "unknown")),
                    })
            out.append({
                "lang": lang,
                "mode": mode,
                "text": text,
                "ctx": ctx,
                "clean": clean,
                "entities": [
                    {
                        "type": e["type"],
                        "start": e["span"][0],
                        "end": e["span"][1],
                        "score": e["score"],
                        "source": e["source"],
                        "text": e.get("text", ""),
                    }
                    for e in entities
                ],
                "events": events,
                "replacement_map": rmap,
            })

# raw (pre-resolution) detector outputs for detector-level parity
raw_out = []
for lang in ("zh", "en"):
    det = get_detector(lang)
    for text in TEXTS:
        # composite union before resolution: call each detector directly
        ents = []
        for d in det.detectors:
            ents.extend(d.detect(text))
        raw_out.append({
            "lang": lang,
            "text": text,
            "raw": [
                {"start": int(e["span"][0]), "end": int(e["span"][1]),
                 "type": e["type"], "score": e["score"], "source": e["source"]}
                for e in ents
            ],
        })

# fake-provider unit vectors
from deid_pipeline.pii.utils.fake_provider import FakeProvider  # noqa: E402
fp = FakeProvider()
fp_vec = []
for typ in ["ID", "TW_ID", "PHONE", "EMAIL", "UNIFIED_BUSINESS_NO", "PASSPORT",
            "MEDICAL_ID", "CONTRACT_NO", "ORGANIZATION", "NAME", "ADDRESS", "OTHER_TYPE"]:
    for orig, ctx in [("A123456789", "abc"), ("x", "0" * 64), ("台北市信義路1號", "ffff")]:
        fp_vec.append({
            "type": typ, "original": orig, "ctx": ctx,
            "value": fp.generate_deterministic(typ, orig, context_hash=ctx),
        })

with open("/root/repo/src/test/resources/golden_deid.json", "w") as f:
    json.dump({"pipeline": out, "raw_detect": raw_out, "fake_provider": fp_vec},
              f, ensure_ascii=False, indent=1)
print("pipeline cases:", len(out), "raw cases:", len(raw_out), "fp vectors:", len(fp_vec))
