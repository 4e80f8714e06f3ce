"""Consensus-spec test vector loader (SURVEY.md §4 tier 4).

Fixtures live in the reference checkout at /root/reference/test_vectors/
<function>/kzg-mainnet/<case>/data.yaml: `input` holds hex fields, `output`
is the expected result or null when the call must error.
"""

from __future__ import annotations

import os
from pathlib import Path

import yaml

VECTOR_ROOT = Path("/root/reference/test_vectors")


def load_cases(function: str):
    base = VECTOR_ROOT / function
    cases = []
    for path in sorted(base.glob("*/*/data.yaml")):
        with open(path) as fh:
            data = yaml.safe_load(fh)
        cases.append((path.parent.name, data["input"], data["output"]))
    assert cases, f"no vectors found for {function}"
    return cases


def unhex(value: str) -> bytes:
    assert value.startswith("0x")
    return bytes.fromhex(value[2:])
