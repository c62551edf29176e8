#!/bin/sh
# Build the native helpers into native/libbyolo_native.so (loaded via ctypes).
set -e
cd "$(dirname "$0")"
cc="${CC:-gcc}"
$cc -O3 -fPIC -shared -o libbyolo_native.so crc32c.c
echo "built $(pwd)/libbyolo_native.so"
