#!/bin/sh
# Regenerate golden bitstreams + decoded YUVs from the reference binaries.
# Requires /root/reference built (make). Run from this directory.
set -e
ENC=/root/reference/build/Thorenc
DEC=/root/reference/build/Thordec
python3 gen_input.py
for cfg in LDB_low_complexity LDB_medium_complexity LDB_high_efficiency RA_low_complexity RA16_high_efficiency HDB16_medium_complexity; do
  $ENC -cf /root/reference/config_${cfg}.txt -if test_cif.yuv -width 352 -height 288 -n 10 -of ${cfg}.bit -rf ${cfg}_rec.yuv
  $DEC ${cfg}.bit ${cfg}_dec.yuv
  cmp ${cfg}_rec.yuv ${cfg}_dec.yuv
done
$ENC -cf /root/reference/config_LDB_low_complexity.txt -if test_cif.yuv -width 352 -height 288 -n 3 -intra_period 1 -of intra_only.bit -rf intra_only_rec.yuv
$DEC intra_only.bit intra_only_dec.yuv
cmp intra_only_rec.yuv intra_only_dec.yuv
