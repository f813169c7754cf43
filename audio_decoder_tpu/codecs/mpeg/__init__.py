"""MPEG-1/2 audio (Layer III) decoding as batched TPU kernels.

The reference only recovers frame boundaries statistically and returns the
still-compressed payload bytes — actual MPEG decode is its explicit TODO
(blast/src/file_parsing/mpeg.rs:7-128, blast/src/main.rs:44-54).  This
package completes that TODO with a full batched decoder:

  framing   — vectorized sync scan + header field decode (≙ mpeg.rs, fixed)
  sideinfo  — side-info/scalefactor bit-field extraction (vectorized)
  tables    — ISO 11172-3 Huffman/scalefactor/requantize tables
  huffman   — SIMD-across-granules entropy decode (vmapped bit loop)
  requant   — power-law requantization + stereo + antialias
  imdct     — hybrid filterbank IMDCT as MXU matmuls
  synthesis — polyphase synthesis filterbank as windowed matmuls
  decoder   — end-to-end batch orchestration
"""
