// Single-rank MPI shim — just enough of the MPI-3 surface to build and run
// the C++ reference solver on one rank for behavioral validation (the image
// ships libopenmpi3 but no headers). All collectives degenerate to memcpy /
// no-ops at size 1; point-to-point between rank 0 and itself never happens
// because MPI_Cart_shift returns MPI_PROC_NULL on a 1x1 grid and the
// reference guards sends by neighbor rank (LBMGrid.h:255-276) — Isend/Irecv
// to MPI_PROC_NULL are no-ops per the MPI standard, which we honor.
#pragma once
#include <cstring>

typedef int MPI_Comm;
typedef int MPI_Datatype;
typedef int MPI_Op;
typedef int MPI_Request;
typedef struct { int ignored; } MPI_Status;

#define MPI_COMM_WORLD 0
#define MPI_PROC_NULL (-2)
#define MPI_DOUBLE 8
#define MPI_INT 4
#define MPI_BYTE 1
#define MPI_SUM 0
#define MPI_MIN 1
#define MPI_MAX 2
#define MPI_STATUSES_IGNORE ((MPI_Status*)0)

static inline int mpi_stub_type_size(MPI_Datatype t) { return t; }

static inline int MPI_Init(int*, char***) { return 0; }
static inline int MPI_Finalize() { return 0; }
static inline int MPI_Comm_rank(MPI_Comm, int* rank) { *rank = 0; return 0; }
static inline int MPI_Comm_size(MPI_Comm, int* size) { *size = 1; return 0; }
static inline int MPI_Barrier(MPI_Comm) { return 0; }

static inline int MPI_Cart_create(MPI_Comm, int, const int*, const int*, int,
                                  MPI_Comm* out) { *out = 0; return 0; }
static inline int MPI_Cart_coords(MPI_Comm, int, int ndims, int* coords) {
  for (int i = 0; i < ndims; ++i) coords[i] = 0;
  return 0;
}
static inline int MPI_Cart_shift(MPI_Comm, int, int, int* lo, int* hi) {
  *lo = MPI_PROC_NULL;  // non-periodic 1x1 grid: no neighbors
  *hi = MPI_PROC_NULL;
  return 0;
}

static inline int MPI_Isend(const void*, int, MPI_Datatype, int, int, MPI_Comm,
                            MPI_Request* req) { *req = 0; return 0; }
static inline int MPI_Irecv(void*, int, MPI_Datatype, int, int, MPI_Comm,
                            MPI_Request* req) { *req = 0; return 0; }
static inline int MPI_Waitall(int, MPI_Request*, MPI_Status*) { return 0; }

static inline int MPI_Allreduce(const void* send, void* recv, int count,
                                MPI_Datatype type, MPI_Op, MPI_Comm) {
  std::memcpy(recv, send, (size_t)count * mpi_stub_type_size(type));
  return 0;
}
static inline int MPI_Reduce(const void* send, void* recv, int count,
                             MPI_Datatype type, MPI_Op, int, MPI_Comm) {
  std::memcpy(recv, send, (size_t)count * mpi_stub_type_size(type));
  return 0;
}
static inline int MPI_Gather(const void* send, int count, MPI_Datatype type,
                             void* recv, int, MPI_Datatype, int, MPI_Comm) {
  std::memcpy(recv, send, (size_t)count * mpi_stub_type_size(type));
  return 0;
}
static inline int MPI_Gatherv(const void* send, int count, MPI_Datatype type,
                              void* recv, const int*, const int* displs,
                              MPI_Datatype, int, MPI_Comm) {
  char* dst = (char*)recv + (displs ? displs[0] : 0) * mpi_stub_type_size(type);
  std::memcpy(dst, send, (size_t)count * mpi_stub_type_size(type));
  return 0;
}
