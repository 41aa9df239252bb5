// Parameterized driver for the *unmodified* reference solver headers
// (included read-only from /root/reference) — used to probe reference
// behavior at parameter points its hard-coded main.cpp cannot reach (it
// ignores argv, src/main.cpp:7-11). Build: validation/build.sh.
//
// Usage: ref_driver <tau> <inlet_u> <nx> <ny> <steps> <out_freq> [vtk=0]
#include <cstdlib>
#include <iostream>

#include "LBMConfig.h"
#include "LBMSolver.h"
#include "LBMIO.h"

int main(int argc, char** argv) {
  MPI_Init(&argc, &argv);
  LBM::SimulationParams p;
  if (argc > 1) p.tau = std::atof(argv[1]);
  if (argc > 2) p.inlet_velocity = std::atof(argv[2]);
  if (argc > 3) p.nx = std::atoi(argv[3]);
  if (argc > 4) p.ny = std::atoi(argv[4]);
  if (argc > 5) p.num_timesteps = std::atoi(argv[5]);
  if (argc > 6) p.output_frequency = std::atoi(argv[6]);
  bool vtk = argc > 7 && std::atoi(argv[7]) != 0;

  LBM::Solver solver(p, vtk);
  LBM::IOManager io;
  solver.initialise();
  bool ok = solver.run(io);
  if (ok) io.write_final_results(solver.get_grid(), p);
  std::cout << (ok ? "REFERENCE_RUN_OK" : "REFERENCE_RUN_UNSTABLE") << std::endl;
  MPI_Finalize();
  return ok ? 0 : 1;
}
