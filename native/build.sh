#!/bin/sh
# Build the native runtime pieces into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    dataloader.cpp -lpng -lz -lpthread \
    -o lib/libslamloader.so
echo "built lib/libslamloader.so"
