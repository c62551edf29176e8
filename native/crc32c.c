/* crc32c (Castagnoli) for TFRecord framing — slicing-by-8.
 *
 * The reference delegates record IO to TensorFlow's C++ tf.data runtime
 * (lib_yolo/dataset_utils.py); our tfrecord reader/writer is pure Python
 * with this native checksum kernel loaded via ctypes.  Built by
 * native/build.sh into libbyolo_native.so.
 */

#include <stddef.h>
#include <stdint.h>

static uint32_t table[8][256];
static int table_init = 0;

static void init_tables(void) {
    const uint32_t poly = 0x82f63b78u; /* reflected CRC-32C */
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t crc = i;
        for (int j = 0; j < 8; j++)
            crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
        table[0][i] = crc;
    }
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t crc = table[0][i];
        for (int k = 1; k < 8; k++) {
            crc = table[0][crc & 0xff] ^ (crc >> 8);
            table[k][i] = crc;
        }
    }
    table_init = 1;
}

uint32_t byolo_crc32c(const uint8_t *buf, size_t len) {
    if (!table_init) init_tables();
    uint32_t crc = 0xffffffffu;
    while (len >= 8) {
        uint32_t lo = crc ^ ((uint32_t)buf[0] | ((uint32_t)buf[1] << 8) |
                             ((uint32_t)buf[2] << 16) | ((uint32_t)buf[3] << 24));
        uint32_t hi = (uint32_t)buf[4] | ((uint32_t)buf[5] << 8) |
                      ((uint32_t)buf[6] << 16) | ((uint32_t)buf[7] << 24);
        crc = table[7][lo & 0xff] ^ table[6][(lo >> 8) & 0xff] ^
              table[5][(lo >> 16) & 0xff] ^ table[4][(lo >> 24) & 0xff] ^
              table[3][hi & 0xff] ^ table[2][(hi >> 8) & 0xff] ^
              table[1][(hi >> 16) & 0xff] ^ table[0][(hi >> 24) & 0xff];
        buf += 8;
        len -= 8;
    }
    while (len--) crc = table[0][(crc ^ *buf++) & 0xff] ^ (crc >> 8);
    return crc ^ 0xffffffffu;
}

/* TFRecord "masked" crc */
uint32_t byolo_masked_crc32c(const uint8_t *buf, size_t len) {
    uint32_t crc = byolo_crc32c(buf, len);
    return (((crc >> 15) | (crc << 17)) + 0xa282ead8u);
}
