/* Minimal stand-in for the CUDA runtime's driver_types.h, providing just
 * the two POD structs the reference kernel source needs when compiled for
 * host (reference cudaSaTabsearch_kernel.cu:56 includes <driver_types.h>
 * only for struct cudaPitchedPtr / cudaExtent).  Field order matches the
 * CUDA runtime ABI so positional aggregate initialisation is identical.
 *
 * Used ONLY by tools/refgolden/build.sh to compile the UNMODIFIED reference
 * sources out-of-tree (in /tmp) as a parity oracle; never part of the
 * installed framework.
 */
#ifndef REFGOLDEN_DRIVER_TYPES_H
#define REFGOLDEN_DRIVER_TYPES_H

#include <stddef.h>

struct cudaPitchedPtr {
  void *ptr;
  size_t pitch;
  size_t xsize;
  size_t ysize;
};

struct cudaExtent {
  size_t width;
  size_t height;
  size_t depth;
};

#endif
