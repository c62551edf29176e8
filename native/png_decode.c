/* PNG -> RGB888 decode on libpng's simplified API.
 *
 * The reference delegates image decode to TensorFlow's native PNG kernel
 * (lib_yolo/dataset_utils.py:8 tf.image.decode_png inside tf.data's C++
 * runtime).  Our host loader decodes through this kernel via ctypes —
 * ctypes releases the GIL for the call, so the cpu_thread_cnt parse pool
 * (data/pipeline.py) scales across real cores.  PIL remains the fallback
 * when libpng is unavailable at build time (see native/build.sh).
 *
 * Gray / palette inputs are converted to RGB by libpng, matching PIL's
 * Image.convert("RGB") and TF's decode_png(channels=3).  Alpha and 16-bit
 * inputs are NOT taken on this path: libpng's simplified API composites
 * alpha against a background and rescales 16-bit differently from PIL, so
 * the loader probes the format first (byolo_png_probe) and routes those
 * through the PIL fallback — hosts with and without the native kernel
 * must produce identical training pixels.
 */

#include <png.h>
#include <stddef.h>
#include <stdint.h>
#include <string.h>

int byolo_png_info(const uint8_t *data, size_t len, int32_t *h, int32_t *w) {
    png_image image;
    memset(&image, 0, sizeof image);
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&image, data, len))
        return -1;
    *h = (int32_t)image.height;
    *w = (int32_t)image.width;
    png_image_free(&image);
    return 0;
}

/* Like byolo_png_info, plus the file's natural-format flags so the caller
 * can reject inputs whose RGB conversion is not bit-identical to PIL:
 * bit 0 = alpha channel present, bit 1 = 16-bit (linear) samples. */
int byolo_png_probe(const uint8_t *data, size_t len, int32_t *h, int32_t *w,
                    int32_t *flags) {
    png_image image;
    memset(&image, 0, sizeof image);
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&image, data, len))
        return -1;
    *h = (int32_t)image.height;
    *w = (int32_t)image.width;
    *flags = 0;
    if (image.format & PNG_FORMAT_FLAG_ALPHA)
        *flags |= 1;
    if (image.format & PNG_FORMAT_FLAG_LINEAR)
        *flags |= 2;
    png_image_free(&image);
    return 0;
}

int byolo_png_decode_rgb(const uint8_t *data, size_t len, uint8_t *out,
                         size_t out_cap) {
    png_image image;
    memset(&image, 0, sizeof image);
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&image, data, len))
        return -1;
    image.format = PNG_FORMAT_RGB;
    if (PNG_IMAGE_SIZE(image) > out_cap) {
        png_image_free(&image);
        return -2;
    }
    if (!png_image_finish_read(&image, NULL, out, 0, NULL)) {
        png_image_free(&image);
        return -3;
    }
    return 0;
}
