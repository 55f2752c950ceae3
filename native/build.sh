#!/usr/bin/env bash
# Build the native YDB store engine -> native/build/libyolodb.so
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
g++ -O2 -std=c++17 -shared -fPIC -Wall -Wextra -o build/libyolodb.so yolodb.cpp
echo "built native/build/libyolodb.so"
