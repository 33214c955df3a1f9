#!/bin/sh
# Build the native prefetch ring -> native/libamatprefetch.so
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 -pthread prefetch.cpp -o libamatprefetch.so
echo "built $(pwd)/libamatprefetch.so"
