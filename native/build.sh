#!/bin/sh
# Build the native helpers into native/libbyolo_native.so (loaded via ctypes).
set -e
cd "$(dirname "$0")"
cc="${CC:-gcc}"
if $cc -O3 -fPIC -shared -o libbyolo_native.so crc32c.c png_decode.c -lpng 2>/dev/null; then
    echo "built $(pwd)/libbyolo_native.so (crc32c + libpng decode)"
else
    # no libpng at build time: PNG decode falls back to PIL in the loader
    $cc -O3 -fPIC -shared -o libbyolo_native.so crc32c.c
    echo "built $(pwd)/libbyolo_native.so (crc32c only; no libpng)"
fi
