#!/usr/bin/env python3
"""Golden fixtures for training-side ops (canonical, pii_markup,
placeholders, masked_pairs, tokenization, mix) by running the reference."""
import json
import sys

sys.path.insert(0, "/root/reference/src")

from deid_pipeline.training import canonical, pii_markup, placeholders, masked_pairs, tokenization, mix  # noqa: E402

out = {}

# P6 canonicalization
raw_types = [
    "PER", "person", "Last-Name", "PATIENT_LAST_NAME", "lastname_12", "EMAIL_2",
    "e-mail", "telefon", "TEL", "telephone", "mobile_no_3", "user-handle",
    "MED_RECORD_ID", "med_id", "ssn", "SSN-4", "zip", "POSTAL",
    "hospital_name", "HOSPITAL", "dob", "DATE-OF-BIRTH", "datetime2",
    "ipv4", "web_site", "credit", "debit_card", "iban_code", "plate-no",
    "age_years", "unknown_thing", "", "  ", "123", "_", "X", "組織",
    "URL_1", "URI", "FAX_NUMBER", "driver-license-2", "BANK", "account",
]
out["canonical"] = [
    {"raw": r, "canon": canonical.canonicalize_entity_type(r)}
    for r in raw_types
]
out["normalize_raw"] = [
    {"raw": r, "norm": canonical.normalize_raw_entity_type(r)}
    for r in raw_types
]

# D10 markup
markup_texts = [
    "Call <PII type='PHONE'>0912345678</PII> or <PII type=\"EMAIL\">a@b.com</PII>.",
    "姓名 [NAME]王小明[/NAME]，電話 [PHONE]0912-345-678[/PHONE]。",
    "nested [A]x[B]y[/B]z[/A] end",
    "multiline <PII type='ADDRESS'>台北市\n信義路1號</PII> ok",
    "no markup here",
    "[BAD]unclosed",
    "<PII type='ID'>A123456789</PII>[PHONE]0912345678[/PHONE]",  # xml wins
    "emoji 😀 then <PII type='NAME'>Bob</PII>",
]
out["markup"] = []
for t in markup_texts:
    blocks = pii_markup.extract_pii_blocks(t)
    out["markup"].append({
        "text": t,
        "fmt": pii_markup.detect_markup_format(t),
        "blocks": [
            {"type": b.pii_type, "value": b.value,
             "vs": b.value_span[0], "ve": b.value_span[1],
             "bs": b.block_span[0], "be": b.block_span[1]}
            for b in blocks
        ],
        "masked": pii_markup.mask_pii_blocks(t, blocks),
        "masked_ph": pii_markup.mask_pii_blocks(t, blocks, placeholder="▮"),
    })

# P7/R6 placeholders
ph_texts = [
    "Hi <LASTNAME_1>, meet {PERSON} at [LOC_2].",
    "<EMAIL>x</EMAIL> keep tags? <WEIRD_9>",
    "沒有占位符",
    "<user_name> lowercase no match, <USER_NAME_3> match",
]
out["placeholders"] = [
    {"text": t, "canon": placeholders.canonicalize_placeholder_text(t)}
    for t in ph_texts
]
ents = [
    {"type": "EMAIL", "span": [6, 13]},
    {"type": "last-name", "span": [17, 22]},
    {"type": "bogus!!", "span": [0, 5]},
    {"type": "PHONE", "span": [100, 120]},  # out of bounds -> skipped
]
t = "send me@b.io to Smith today"
out["replace_spans"] = {
    "text": t, "entities": ents,
    "result": placeholders.replace_spans_with_placeholders(t, ents),
}

# D11 masked pairs
pairs = [
    ("John Smith lives at 10 Broadway Ave", "<NAME> <NAME> lives at [ADDRESS]"),
    ("Call Alice at 0912345678 now", "Call <PERSON> at {PHONE} now"),
    ("a b c d", "a b c d"),
    ("secret stuff here", "<ID_1> redacted <EMAIL>"),
    ("王小明 住 台北市信義路1號", "<NAME> 住 <ADDRESS>"),
    ("one two three", "one <LOC> <LOC> <LOC> three"),
    ("x A123456789 y a@b.com z", "x <ID> y <EMAIL> z"),
]
out["masked_pairs"] = []
for orig, masked in pairs:
    es = masked_pairs.extract_entities_from_masked_pair(orig, masked)
    out["masked_pairs"].append({
        "orig": orig, "masked": masked,
        "entities": [
            {"type": e["type"], "start": e["span"][0], "end": e["span"][1],
             "text": e["text"]}
            for e in es
        ],
    })

# F9/F10 tokenization
label_list = tokenization.build_bio_label_list(["PHONE", "NAME", "EMAIL", "NAME", ""])
label_to_id = {l: i for i, l in enumerate(label_list)}
offsets = [(0, 0), (0, 4), (5, 10), (10, 12), (13, 20), (0, 0)]
ents2 = [{"type": "NAME", "span": (5, 12)}, {"type": "PHONE", "span": (13, 20)}]
out["tokenization"] = {
    "labels": label_list,
    "aligned": tokenization.align_entities_to_tokens(
        entities=ents2, offset_mapping=offsets, label_to_id=label_to_id),
}

# O2 mix shuffle order
items = [f"e{i}" for i in range(17)]
out["mix_shuffle"] = {
    "n": 17, "seed": 42,
    "result": mix.mix_span_examples([("s", items)], shuffle=True, seed=42),
}

# O4 reservoir
import random  # noqa: E402
rng = random.Random(7)
sample = []
total = 0
for i in range(100):
    total += 1
    if len(sample) < 10:
        sample.append(i)
    else:
        j = rng.randint(0, total - 1)
        if j < 10:
            sample[j] = i
out["reservoir"] = {"k": 10, "n": 100, "seed": 7, "result": sample}

with open("/root/repo/src/test/resources/golden_training.json", "w") as f:
    json.dump(out, f, ensure_ascii=False, indent=1)
print("ok", {k: (len(v) if isinstance(v, list) else 1) for k, v in out.items()})
