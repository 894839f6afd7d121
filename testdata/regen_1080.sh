#!/bin/sh
# Regenerate the 1080p golden bitstreams used by bench.py and the slow
# decode tests. Run from this directory with /root/reference built (or
# the binaries copied to ../.oracle). Only the .bit files and the
# SHA-256 of the reference Thordec decode are committed (the raw YUVs
# are ~50 MB); bench/tests verify bit-exactness against the hash.
set -e
ENC=${ENC:-/root/repo/.oracle/Thorenc}
DEC=${DEC:-/root/repo/.oracle/Thordec}
python3 gen_input_1080.py
for cfg in LDB_medium_complexity RA16_high_efficiency; do
  $ENC -cf /root/reference/config_${cfg}.txt -if test_1080.yuv -width 1920 -height 1080 -n 17 -of ${cfg}_1080.bit -rf ${cfg}_1080_rec.yuv
  $DEC ${cfg}_1080.bit ${cfg}_1080_dec.yuv
  cmp ${cfg}_1080_rec.yuv ${cfg}_1080_dec.yuv
  sha256sum ${cfg}_1080_dec.yuv | awk '{print $1}' > ${cfg}_1080_dec.sha256
  rm -f ${cfg}_1080_rec.yuv
done
