#!/bin/sh
# Build the reference x265 (C-only — nasm is absent from this image) into
# .ref_build/ for bench.py's baseline measurement. Config recorded in
# .bench_baseline.json next to the measured fps.
set -e
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
BUILD=/tmp/ref_build
mkdir -p "$BUILD"
cd "$BUILD"
cmake /root/reference/source -DENABLE_ASSEMBLY=OFF -DENABLE_SHARED=OFF \
      -DCMAKE_BUILD_TYPE=Release -G Ninja
ninja x265
mkdir -p "$REPO/.ref_build"
cp "$BUILD/x265" "$REPO/.ref_build/x265"
"$REPO/.ref_build/x265" --version
