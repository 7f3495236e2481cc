"""Re-bless the golden-bitstream corpus: encode every config, verify each
stream decodes bit-exactly is NOT checked here (conformance suites do
that) — but each stream must at least DECODE with cv2/FFmpeg before its
hash is recorded. Writes tests/golden/manifest.json."""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from golden_corpus import CONFIGS, clip


def main():
    from x265_yuuki_asuna_tpu.utils.av_decode import decode_hevc
    frames = clip()
    manifest = {}
    for name, build in CONFIGS:
        stream = build(frames)
        dec = decode_hevc(stream, 64, 48)
        assert len(dec) == len(frames), \
            f"{name}: stream does not decode to {len(frames)} frames"
        manifest[name] = hashlib.md5(stream).hexdigest()
        print(f"{name}: {manifest[name]} ({len(stream)} bytes)")
    out = os.path.join(os.path.dirname(__file__), "..", "golden",
                       "manifest.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    json.dump(manifest, open(out, "w"), indent=1, sort_keys=True)
    print(f"blessed {len(manifest)} configs -> {out}")


if __name__ == "__main__":
    main()
