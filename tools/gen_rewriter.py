#!/usr/bin/env python3
"""Goldens for RewriterSpec: the reference's rewriter-corpus dataflow
(training/rewriter.py + scripts/prepare_rewriter_corpus.py per-item block)
run seeded — hash16, placeholder filling through the real FakeProvider,
punctuation noise, and whole prompt pairs."""
import json
import os
import random
import sys

sys.path.insert(0, "/root/reference/src")
os.environ.setdefault("USE_STUB", "true")

from deid_pipeline.pii.utils.fake_provider import FakeProvider  # noqa: E402
from deid_pipeline.training.rewriter import (  # noqa: E402
    build_prompt, fill_placeholders_with_fake_values, hash16, make_noisy)
from deid_pipeline.training.placeholders import (  # noqa: E402
    canonicalize_placeholder_text, contains_cjk)

provider = FakeProvider()

TEXTS = [
    "請聯絡 <NAME>，電話 <PHONE>，郵件 [EMAIL_ADDRESS]。",
    "病患 <LASTNAME_1> 的病歷號 {MEDICAL_RECORD} 已更新。",
    "Plain english with <EMAIL> and <PHONE_2> inside.",
    "身分證 <TW_ID> 與護照 <PASSPORT>；地址：<ADDRESS>。",
    "no placeholders at all，只有中文標點。",
    "<UNKNOWN_THING> becomes the unknown label.",
    "混合 <NAME> text，多個 <NAME> 重複 <NAME>。",
]

cases = []

for i, t in enumerate(TEXTS):
    p = canonicalize_placeholder_text(t)
    ctx = hash16(p)
    filled = fill_placeholders_with_fake_values(p, provider, context_hash=ctx)
    cases.append({"kind": "fill", "text": t, "ctx": ctx, "value": filled})

for seed in range(15):
    rng = random.Random(seed)
    noisy = make_noisy("好的，測試：句子。與 english, words; 混合．", rng)
    cases.append({"kind": "noisy", "seed": seed, "value": noisy})

for lang in ("zh", "en"):
    cases.append({"kind": "prompt", "lang": lang,
                  "value": build_prompt("NOISY-IN", "CLEAN-OUT", language=lang)})

# full per-item pipeline with ONE rng threaded across items (the script's
# sequential contract) — proves draw accounting across rows
for seed in (100, 101):
    rng = random.Random(seed)
    outs = []
    for t in TEXTS:
        p = canonicalize_placeholder_text(t)
        ctx = hash16(p)
        clean = fill_placeholders_with_fake_values(p, provider, context_hash=ctx).strip()
        if not contains_cjk(clean):
            continue
        noisy = make_noisy(clean, rng)
        outs.append(build_prompt(noisy, clean, language="zh"))
    cases.append({"kind": "pipeline", "seed": seed, "value": "\x00".join(outs)})

out = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/golden_rewriter.json")
with open(out, "w") as f:
    json.dump(cases, f, ensure_ascii=False)
print(f"wrote {len(cases)} cases")
