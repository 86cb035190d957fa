"""pangenome_index_tpu: a TPU-native pangenome indexing & query framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`parsaeskandar/pangenome-index` (C++/OpenMP reference):

* r-index (run-length BWT + SA samples) with count / locate / LF / psi
  (reference: include/pangenome_index/r-index.hpp, src/r-index.cpp)
* FMD bidirectional extension + maximal-exact-match (MEM) finding
  (reference: include/pangenome_index/algorithm.hpp:625-757)
* Tag arrays mapping BWT positions -> pangenome graph positions
  (reference: include/pangenome_index/tag_arrays.hpp, src/tag_arrays.cpp)
* Index construction pipeline + per-chromosome sharding / merge
  (reference: src/build_tags.cpp, src/merge_tags.cpp)

Layout:
  formats/   on-disk codecs (.rl_bwt, sdsl structures, .ri, .tags, GBZ)
  models/    host-side index models (numpy) and device table layouts
  ops/       JAX/Pallas device kernels (rank, LF, FMD, MEM, tag query)
  parallel/  mesh / sharding / distributed query & merge
  utils/     alphabet, config, timing
"""

__version__ = "0.1.0"
