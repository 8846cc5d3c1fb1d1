#!/bin/sh
# Build the native golden scanner shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libgolden_scan.so golden_scan.cpp
echo "built $(pwd)/libgolden_scan.so"
