#!/bin/sh
# Build libgpvae_native.so next to this script.  CMake path preferred;
# plain g++ fallback keeps the build dependency surface minimal.
set -e
cd "$(dirname "$0")"
if command -v cmake >/dev/null 2>&1 && command -v ninja >/dev/null 2>&1; then
  cmake -G Ninja -B build -DCMAKE_BUILD_TYPE=Release >/dev/null
  ninja -C build >/dev/null
  cp build/libgpvae_native.so .
else
  g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    data_pipeline.cc -o libgpvae_native.so
fi
echo "built $(pwd)/libgpvae_native.so"
