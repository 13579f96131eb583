#!/bin/sh
# Build the native graph-builder shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libmgn_native.so graph_builder.cpp
echo "built $(pwd)/libmgn_native.so"
