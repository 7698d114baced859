#!/bin/bash
# Build the fastload native library. Output: native/libfastload.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libfastload.so fastload.cc -ljpeg
echo "built $(pwd)/libfastload.so"
