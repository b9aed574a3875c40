#!/bin/sh
# Build the native runtime pieces. Idempotent; run from anywhere.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libradix_tree.so radix_tree.cc
echo "built $(pwd)/libradix_tree.so"
