// Manual sanity probe against a live prediction server — the analog of
// the reference's hard-coded one-sample client check
// (deep_fm_serving_client.cpp:42-45 packs one known example).
//
//   ./ctr_client <host> <port> <model> [field_size]
//   ./ctr_client <host> <port> <model> example     — parsing-signature
//       mode: one serialized tf.Example with I1..I13/C1..C26 features
//       (wide_n_deep_serving_client.cpp parity)
//   ./ctr_client <host> <port> <model> grpc [field_size] — gRPC
//       transport mode: the same raw tensors as a hand-encoded
//       PredictRequest over grpc-web framing
//       (deep_fm_serving_client.cpp:35-69 parity)

#include <cstdlib>
#include <cstring>
#include <iostream>

#include "ctr_serving_client.h"

int main(int argc, char** argv) {
  std::string host = argc > 1 ? argv[1] : "127.0.0.1";
  int port = argc > 2 ? std::atoi(argv[2]) : 8501;
  std::string model = argc > 3 ? argv[3] : "DeepFM";
  bool example_mode = argc > 4 && std::strcmp(argv[4], "example") == 0;
  bool grpc_mode = argc > 4 && std::strcmp(argv[4], "grpc") == 0;
  int field_size = argc > 5 && grpc_mode ? std::atoi(argv[5])
                   : (argc > 4 && !example_mode && !grpc_mode)
                       ? std::atoi(argv[4])
                       : 39;

  auto client = tpu_ctr::ServingClient::Create(host, port);

  std::cout << "status: " << client->getModelStatus(model) << "\n";

  if (example_mode) {
    // the reference client's hard-coded probe: 13 floats 0.5, 26 ids
    std::vector<std::vector<double>> cont(1, std::vector<double>(13, 0.5));
    std::vector<std::vector<long long>> cats(1, std::vector<long long>(26));
    for (int i = 0; i < 26; ++i) cats[0][i] = i + 1;
    auto preds = client->callPredictExample(model, cont, cats);
    if (preds.empty()) {
      std::cerr << "predict failed: " << client->LastError() << "\n";
      return 1;
    }
    for (double p : preds) std::cout << "pctr = " << p << "\n";
    return 0;
  }

  // one example: continuous fields get small values, categoricals id 1..F
  std::vector<std::vector<long long>> ids(1, std::vector<long long>(field_size));
  std::vector<std::vector<double>> vals(1, std::vector<double>(field_size, 1.0));
  for (int f = 0; f < field_size; ++f) {
    ids[0][f] = f + 1;
    if (f < 13) vals[0][f] = 0.5;
  }
  auto preds = grpc_mode ? client->callPredictGrpc(model, ids, vals)
                         : client->callPredict(model, ids, vals);
  if (preds.empty()) {
    std::cerr << "predict failed: " << client->LastError() << "\n";
    return 1;
  }
  for (double p : preds) std::cout << "pctr = " << p << "\n";
  return 0;
}
