#!/bin/sh
# Build the native scene-compiler core.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 scene_core.cpp -o libscene_core.so
echo "built native/libscene_core.so"
