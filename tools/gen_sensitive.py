#!/usr/bin/env python3
"""Golden fixtures for SensitiveDataGenSpec: run the reference's
sensitive_data_generator (generators.py + formatters.py) under seeded
MT19937 with a frozen datetime.now(), dump (seed, kind, value) cases.

PIL is absent in this sandbox; file_writers imports it at package-import
time, so stub it (the formatters/generators under test don't touch it).
"""
import json
import os
import random
import sys
import types
import datetime as _dt

sys.path.insert(0, "/root/reference")

# stub PIL so sensitive_data_generator/__init__.py imports cleanly
pil = types.ModuleType("PIL")
for sub in ("Image", "ImageDraw", "ImageFont"):
    m = types.ModuleType(f"PIL.{sub}")
    setattr(pil, sub, m)
    sys.modules[f"PIL.{sub}"] = m
sys.modules["PIL"] = pil

import sensitive_data_generator.generators as G  # noqa: E402
import sensitive_data_generator.formatters as F  # noqa: E402
import sensitive_data_generator.advanced_formatters as AF  # noqa: E402
from sensitive_data_generator.generators import PIIGenerator  # noqa: E402
from sensitive_data_generator.formatters import DataFormatter  # noqa: E402
from sensitive_data_generator.advanced_formatters import AdvancedDataFormatter  # noqa: E402


class FrozenDateTime(_dt.datetime):
    @classmethod
    def now(cls, tz=None):
        return cls(2026, 1, 15, 12, 0, 0)


G.datetime = FrozenDateTime
F.datetime = FrozenDateTime
AF.datetime = FrozenDateTime

FUNCS = {
    "tw_id": PIIGenerator.generate_tw_id,
    "tw_phone": PIIGenerator.generate_tw_phone,
    "tw_address": PIIGenerator.generate_tw_address,
    "tw_name": PIIGenerator.generate_tw_name,
    "medical_record_id": PIIGenerator.generate_medical_record,
    "credit_card": PIIGenerator.generate_credit_card,
    "date_of_birth": PIIGenerator.generate_date_of_birth,
    "email": PIIGenerator.generate_email,
    "passport": PIIGenerator.generate_passport,
    "license_plate": PIIGenerator.generate_license_plate,
    "health_insurance": PIIGenerator.generate_health_insurance,
    "paragraph": DataFormatter.generate_paragraph,
    "medical_record_doc": DataFormatter.generate_medical_record,
    "financial_doc": DataFormatter.generate_financial_document,
    "random_doc": DataFormatter.generate_random_document,
    "contract_doc": AdvancedDataFormatter.generate_contract_document,
    "medical_report": AdvancedDataFormatter.generate_medical_report,
    "financial_statement": AdvancedDataFormatter.generate_financial_statement,
}

cases = []
for kind, fn in FUNCS.items():
    for seed in range(25):
        random.seed(seed)
        cases.append({"kind": kind, "seed": seed, "value": fn()})

# dataset-factory item case: the per-iteration draw block of
# file_writers.generate_dataset (random_pii -> value -> context -> document)
for seed in range(2000, 2020):
    random.seed(seed)
    pii_type, gen = PIIGenerator.generate_random_pii()
    value = gen()
    ctx = DataFormatter.generate_paragraph(1, 3, 0.1)
    doc = DataFormatter.generate_random_document()
    cases.append({"kind": "dataset_item", "seed": seed,
                  "value": "\x00".join([pii_type, value, ctx, doc])})

# consecutive-draw case: several values off ONE seeded stream, proving the
# port's draw accounting matches across call boundaries
for seed in range(10):
    random.seed(1000 + seed)
    stream = [
        PIIGenerator.generate_tw_id(),
        PIIGenerator.generate_tw_address(),
        DataFormatter.generate_paragraph(2, 4, 0.5),
        PIIGenerator.generate_email(),
        DataFormatter.generate_financial_document(),
    ]
    cases.append({"kind": "stream", "seed": 1000 + seed, "value": "\x00".join(stream)})

out = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/golden_sensitive.json")
with open(out, "w") as f:
    json.dump({"now": "2026-01-15", "cases": cases}, f, ensure_ascii=False)
print(f"wrote {len(cases)} cases")
