"""Golden-bitstream regression: every corpus config must reproduce its
blessed stream hash bit-for-bit (reference regression-tests.txt flow).
On a legitimate output change: verify conformance, then re-bless with
python tests/tools/bless_golden.py and commit the new manifest."""
import hashlib
import json
import os

import pytest

from tests.golden_corpus import CONFIGS, clip

MANIFEST = os.path.join(os.path.dirname(__file__), "golden", "manifest.json")


@pytest.fixture(scope="module")
def frames():
    return clip()


@pytest.fixture(scope="module")
def manifest():
    if not os.path.exists(MANIFEST):
        pytest.skip("no blessed manifest (run tests/tools/bless_golden.py)")
    return json.load(open(MANIFEST))


@pytest.mark.parametrize("name,build", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_golden(name, build, frames, manifest):
    if name not in manifest:
        pytest.skip(f"{name} not blessed yet")
    h = hashlib.md5(build(frames)).hexdigest()
    assert h == manifest[name], \
        (f"{name}: stream changed (got {h}, blessed {manifest[name]}). "
         f"If intentional: verify conformance, re-bless, commit.")
