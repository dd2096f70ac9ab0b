#!/usr/bin/env python3
"""Reference side of the head-to-head: run edge-deid-studio's own
`scripts/benchmark_pipeline.py` protocol in-place (same stubs as the golden
generators: USE_STUB=true, torch/cv2 stubbed, faker absent) and print ONE
JSON line {p50_ms, p95_ms, mean_ms, entities, chars, runs}.

The measured work is DeidPipeline.process on the protocol's 10k-char zh
synthetic text (scripts/benchmark_pipeline.py:35-42), p50 = statistics.median,
p95 = sorted[int(0.95*(n-1))] (same file:45-52). Engine twin:
src/main/scala/graft/tools/RefBench.scala.
"""
import json
import os
import statistics
import sys
import tempfile
import time
import types
from pathlib import Path

sys.path.insert(0, "/root/reference/src")
os.environ.setdefault("USE_STUB", "true")
for mod in ("torch", "cv2"):
    if mod not in sys.modules:
        sys.modules[mod] = types.ModuleType(mod)

runs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
warmup = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from deid_pipeline import DeidPipeline  # noqa: E402

base = (
    "ID A123456789 and phone 0912345678. "
    "Email test@example.com. Address 台北市信義路1號. "
)
chunks = []
while sum(len(c) for c in chunks) < 10_000:
    chunks.append(base)
text = "".join(chunks)[:10_000]

with tempfile.TemporaryDirectory() as td:
    inp = Path(td) / "bench.txt"
    inp.write_text(text, encoding="utf-8")
    pipeline = DeidPipeline(language="zh")
    for _ in range(warmup):
        result = pipeline.process(str(inp), output_mode="replace")
    wall_ms = []
    for _ in range(runs):
        t0 = time.perf_counter()
        result = pipeline.process(str(inp), output_mode="replace")
        wall_ms.append((time.perf_counter() - t0) * 1000.0)
    s = sorted(wall_ms)
    p50 = statistics.median(s)
    p95 = s[int(0.95 * (len(s) - 1))]
    print(json.dumps({
        "p50_ms": round(p50, 3), "p95_ms": round(p95, 3),
        "mean_ms": round(sum(s) / len(s), 3),
        "entities": len(result.entities), "chars": 10_000, "runs": runs,
    }))
