#!/usr/bin/env python3
"""Randomized FILE-level parity battery: run the reference DeidPipeline over
generated .txt and .csv documents (the dependency-free handlers) in both
replace and black modes, capture the rebuilt output files byte-for-byte.

Output: src/test/resources/golden_files.json
"""
import json
import pathlib
import random
import sys
import tempfile
import types

sys.path.insert(0, "/root/reference/src")
import os
os.environ.setdefault("USE_STUB", "true")
for m in ("torch", "cv2"):
    sys.modules.setdefault(m, types.ModuleType(m))

from deid_pipeline import DeidPipeline  # noqa: E402

PII = [
    "A123456789", "B987654321", "0912-345-678", "0988111222", "0912345678",
    "test@example.com", "alice.wu@corp.com.tw", "M1234567", "PA1234567",
    "12345678", "台北市信義路1號", "新北市中山路10號", "123-45-6789",
]
WORDS = ["order", "status", "請", "確認", "note", "ok", "details", "row",
         "value", "客戶", "回覆", "thanks", "done", "x1", "#tag", "früh"]

rng = random.Random(20260816)


def rand_text(n_tokens):
    toks = []
    for _ in range(n_tokens):
        toks.append(rng.choice(PII) if rng.random() < 0.3 else rng.choice(WORDS))
    return " ".join(toks)


def rand_csv(rows, cols):
    out = []
    for _ in range(rows):
        row = []
        for _ in range(cols):
            r = rng.random()
            if r < 0.35:
                row.append(rng.choice(PII))
            elif r < 0.5:
                row.append(f"note, with comma {rng.choice(WORDS)}")
            elif r < 0.6:
                row.append(f'quote "{rng.choice(WORDS)}"')
            else:
                row.append(rng.choice(WORDS))
        out.append(row)
    import io, csv as csvmod
    buf = io.StringIO()
    csvmod.writer(buf, lineterminator="\n").writerows(out)
    return buf.getvalue()


cases = []
pipe = {lang: DeidPipeline(language=lang) for lang in ("zh", "en")}
with tempfile.TemporaryDirectory() as td:
    d = pathlib.Path(td)
    for i in range(30):
        ext = "txt" if i % 2 == 0 else "csv"
        lang = "zh" if i % 3 else "en"
        mode = "black" if i % 5 == 0 else "replace"
        content = rand_text(rng.randint(3, 25)) if ext == "txt" else \
            rand_csv(rng.randint(1, 6), rng.randint(1, 5))
        f = d / f"case{i}.{ext}"
        f.write_text(content, encoding="utf-8")
        out_dir = d / f"out{i}"
        res = pipe[lang].process(str(f), output_mode=mode, output_dir=str(out_dir))
        out_path = pathlib.Path(res.artifacts["output_path"])
        cases.append({
            "name": f.name, "ext": ext, "lang": lang, "mode": mode,
            "input": content,
            "output": out_path.read_bytes().decode("utf-8"),
            "n_entities": len(res.entities),
        })

dst = pathlib.Path(__file__).resolve().parent.parent / "src/test/resources/golden_files.json"
dst.write_text(json.dumps(cases, ensure_ascii=False, indent=0), encoding="utf-8")
print(f"wrote {len(cases)} cases to {dst}")
