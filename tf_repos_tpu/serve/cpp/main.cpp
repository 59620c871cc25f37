// Manual sanity probe against a live prediction server — the analog of
// the reference's hard-coded one-sample client check
// (deep_fm_serving_client.cpp:42-45 packs one known example).
//
//   ./ctr_client <host> <port> <model> [field_size]

#include <cstdlib>
#include <iostream>

#include "ctr_serving_client.h"

int main(int argc, char** argv) {
  std::string host = argc > 1 ? argv[1] : "127.0.0.1";
  int port = argc > 2 ? std::atoi(argv[2]) : 8501;
  std::string model = argc > 3 ? argv[3] : "DeepFM";
  int field_size = argc > 4 ? std::atoi(argv[4]) : 39;

  auto client = tpu_ctr::ServingClient::Create(host, port);

  std::cout << "status: " << client->getModelStatus(model) << "\n";

  // one example: continuous fields get small values, categoricals id 1..F
  std::vector<std::vector<long long>> ids(1, std::vector<long long>(field_size));
  std::vector<std::vector<double>> vals(1, std::vector<double>(field_size, 1.0));
  for (int f = 0; f < field_size; ++f) {
    ids[0][f] = f + 1;
    if (f < 13) vals[0][f] = 0.5;
  }
  auto preds = client->callPredict(model, ids, vals);
  if (preds.empty()) {
    std::cerr << "predict failed: " << client->LastError() << "\n";
    return 1;
  }
  for (double p : preds) std::cout << "pctr = " << p << "\n";
  return 0;
}
