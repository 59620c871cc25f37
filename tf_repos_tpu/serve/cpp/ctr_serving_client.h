// C++ serving client for the TPU CTR prediction server.
//
// Parity with the reference's TF-Serving gRPC clients
// (/root/reference/deep_ctr/Serving_pipeline/deep_fm_serving_client.h:24-37
// and wide_n_deep_serving_client.h) re-designed for the new stack: the
// server (tf_repos_tpu/serve/server.py) speaks the TF-Serving REST shape
// over plain HTTP/1.1, so this client needs no grpc/protobuf — just POSIX
// sockets. Two request signatures are provided, mirroring the reference:
//   callPredict        raw-tensor:  feat_ids int[N,F] + feat_vals float[N,F]
//                      (deep_fm_serving_client.cpp:42-62 equivalent)
//   callPredictExample named-feature rows: 13 floats I1..I13 + 26 ints
//                      C14..C39 (wide_n_deep_serving_client.cpp:45-62
//                      equivalent; maps to the csv signature cont/cat)
#pragma once

#include <map>
#include <memory>
#include <string>
#include <vector>

namespace tpu_ctr {

class ServingClient {
 public:
  // host:port of a running tf_repos_tpu.serve.server
  static std::unique_ptr<ServingClient> Create(const std::string& host,
                                               int port);

  ~ServingClient();

  // Raw-tensor signature (libsvm models: DeepFM, DCN, NFM, ...).
  // feat_ids/feat_vals are [batch][field_size]. Returns per-example
  // predictions (primary output key), empty on error (see LastError()).
  std::vector<double> callPredict(
      const std::string& model_name,
      const std::vector<std::vector<long long>>& feat_ids,
      const std::vector<std::vector<double>>& feat_vals);

  // Named-feature signature (wide_n_deep csv models): each example is
  // 13 continuous I-features and 26 categorical C-feature ids.
  std::vector<double> callPredictExample(
      const std::string& model_name,
      const std::vector<std::vector<double>>& cont_features,
      const std::vector<std::vector<long long>>& cat_features);

  // gRPC transport parity (deep_fm_serving_client.cpp:35-69): the same
  // raw-tensor call as callPredict, but carried as a hand-encoded
  // tensorflow.serving PredictRequest/PredictResponse proto pair over
  // the grpc-web framing (POST /tensorflow.serving.PredictionService/
  // Predict, application/grpc-web+proto) — the reference's wire format
  // without a grpc++/protobuf dependency. The same server also exposes
  // native gRPC/h2 for stock clients (serve/grpc_server.py).
  std::vector<double> callPredictGrpc(
      const std::string& model_name,
      const std::vector<std::vector<long long>>& feat_ids,
      const std::vector<std::vector<double>>& feat_vals);

  // Model status probe (GET /v1/models/<name>); returns raw JSON.
  std::string getModelStatus(const std::string& model_name);

  const std::string& LastError() const { return last_error_; }

 private:
  ServingClient(const std::string& host, int port);

  // One HTTP round trip; returns response body or "" on failure.
  std::string httpRequest(const std::string& method, const std::string& path,
                          const std::string& body,
                          const std::string& content_type = "application/json");
  std::vector<double> parsePredictions(const std::string& json_body);

  std::string host_;
  int port_;
  std::string last_error_;
};

}  // namespace tpu_ctr
