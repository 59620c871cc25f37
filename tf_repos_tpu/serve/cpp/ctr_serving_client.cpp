// See ctr_serving_client.h. Plain POSIX-socket HTTP/1.1 + minimal JSON —
// the request/response handling the reference does through grpc/protobuf
// (deep_fm_serving_client.cpp:27-106) without those dependencies.

#include "ctr_serving_client.h"

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstring>
#include <sstream>

namespace tpu_ctr {

std::unique_ptr<ServingClient> ServingClient::Create(const std::string& host,
                                                     int port) {
  return std::unique_ptr<ServingClient>(new ServingClient(host, port));
}

ServingClient::ServingClient(const std::string& host, int port)
    : host_(host), port_(port) {}

ServingClient::~ServingClient() = default;

namespace {

int Connect(const std::string& host, int port, std::string* err) {
  struct addrinfo hints, *res = nullptr;
  std::memset(&hints, 0, sizeof(hints));
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  const std::string port_str = std::to_string(port);
  int rc = getaddrinfo(host.c_str(), port_str.c_str(), &hints, &res);
  if (rc != 0) {
    *err = std::string("getaddrinfo: ") + gai_strerror(rc);
    return -1;
  }
  int fd = -1;
  for (struct addrinfo* p = res; p != nullptr; p = p->ai_next) {
    fd = socket(p->ai_family, p->ai_socktype, p->ai_protocol);
    if (fd < 0) continue;
    if (connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  if (fd < 0) *err = "connect failed to " + host + ":" + port_str;
  return fd;
}

bool SendAll(int fd, const std::string& data) {
  size_t off = 0;
  while (off < data.size()) {
    ssize_t n = send(fd, data.data() + off, data.size() - off, 0);
    if (n <= 0) return false;
    off += static_cast<size_t>(n);
  }
  return true;
}

template <typename T>
void AppendMatrix(std::ostringstream& os,
                  const std::vector<std::vector<T>>& m) {
  os << "[";
  for (size_t i = 0; i < m.size(); ++i) {
    if (i) os << ",";
    os << "[";
    for (size_t j = 0; j < m[i].size(); ++j) {
      if (j) os << ",";
      os << m[i][j];
    }
    os << "]";
  }
  os << "]";
}

// ---- tf.Example wire format (hand-encoded: no protobuf dependency).
// Example{1:Features}, Features{1:map<string,Feature>},
// Feature{2:FloatList|3:Int64List}, lists packed in field 1 — the exact
// bytes the reference's client produces via protobuf
// (wide_n_deep_serving_client.cpp:45-56).
void PutVarint(std::string* out, unsigned long long v) {
  while (true) {
    unsigned char b = v & 0x7F;
    v >>= 7;
    if (v) {
      out->push_back(static_cast<char>(b | 0x80));
    } else {
      out->push_back(static_cast<char>(b));
      return;
    }
  }
}

void PutLenField(std::string* out, int field, const std::string& payload) {
  PutVarint(out, (static_cast<unsigned>(field) << 3) | 2);
  PutVarint(out, payload.size());
  out->append(payload);
}

std::string FloatListFeature(const std::vector<double>& vals) {
  std::string packed;
  for (double d : vals) {
    float f = static_cast<float>(d);
    char buf[4];
    std::memcpy(buf, &f, 4);  // little-endian hosts
    packed.append(buf, 4);
  }
  std::string list;
  PutLenField(&list, 1, packed);
  std::string feature;
  PutLenField(&feature, 2, list);
  return feature;
}

std::string Int64ListFeature(const std::vector<long long>& vals) {
  std::string packed;
  for (long long v : vals)
    PutVarint(&packed, static_cast<unsigned long long>(v));
  std::string list;
  PutLenField(&list, 1, packed);
  std::string feature;
  PutLenField(&feature, 3, list);
  return feature;
}

std::string SerializeExample(
    const std::vector<std::pair<std::string, std::string>>& features) {
  std::string entries;
  for (const auto& kv : features) {
    std::string entry;
    PutLenField(&entry, 1, kv.first);
    PutLenField(&entry, 2, kv.second);
    PutLenField(&entries, 1, entry);
  }
  std::string example;
  PutLenField(&example, 1, entries);
  return example;
}

std::string Base64(const std::string& in) {
  static const char* kAlpha =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  std::string out;
  size_t i = 0;
  while (i + 2 < in.size()) {
    unsigned n = (static_cast<unsigned char>(in[i]) << 16) |
                 (static_cast<unsigned char>(in[i + 1]) << 8) |
                 static_cast<unsigned char>(in[i + 2]);
    out.push_back(kAlpha[(n >> 18) & 63]);
    out.push_back(kAlpha[(n >> 12) & 63]);
    out.push_back(kAlpha[(n >> 6) & 63]);
    out.push_back(kAlpha[n & 63]);
    i += 3;
  }
  if (i + 1 == in.size()) {
    unsigned n = static_cast<unsigned char>(in[i]) << 16;
    out.push_back(kAlpha[(n >> 18) & 63]);
    out.push_back(kAlpha[(n >> 12) & 63]);
    out.append("==");
  } else if (i + 2 == in.size()) {
    unsigned n = (static_cast<unsigned char>(in[i]) << 16) |
                 (static_cast<unsigned char>(in[i + 1]) << 8);
    out.push_back(kAlpha[(n >> 18) & 63]);
    out.push_back(kAlpha[(n >> 12) & 63]);
    out.push_back(kAlpha[(n >> 6) & 63]);
    out.push_back('=');
  }
  return out;
}

}  // namespace

std::string ServingClient::httpRequest(const std::string& method,
                                       const std::string& path,
                                       const std::string& body,
                                       const std::string& content_type) {
  last_error_.clear();
  int fd = Connect(host_, port_, &last_error_);
  if (fd < 0) return "";
  std::ostringstream req;
  req << method << " " << path << " HTTP/1.1\r\n"
      << "Host: " << host_ << "\r\n"
      << "Content-Type: " << content_type << "\r\n"
      << "Content-Length: " << body.size() << "\r\n"
      << "Connection: close\r\n\r\n"
      << body;
  if (!SendAll(fd, req.str())) {
    last_error_ = "send failed";
    close(fd);
    return "";
  }
  std::string resp;
  char buf[4096];
  ssize_t n;
  while ((n = recv(fd, buf, sizeof(buf), 0)) > 0) resp.append(buf, n);
  close(fd);
  size_t header_end = resp.find("\r\n\r\n");
  if (header_end == std::string::npos) {
    last_error_ = "malformed HTTP response";
    return "";
  }
  if (resp.compare(0, 12, "HTTP/1.1 200") != 0 &&
      resp.compare(0, 12, "HTTP/1.0 200") != 0) {
    last_error_ = "HTTP error: " + resp.substr(0, resp.find("\r\n"));
    return "";
  }
  return resp.substr(header_end + 4);
}

std::vector<double> ServingClient::parsePredictions(
    const std::string& json_body) {
  // Extracts the "predictions" array of numbers (or of objects, in which
  // case the first numeric field of each object is taken).
  std::vector<double> out;
  size_t pos = json_body.find("\"predictions\"");
  if (pos == std::string::npos) {
    last_error_ = "no predictions in response: " + json_body;
    return out;
  }
  pos = json_body.find('[', pos);
  if (pos == std::string::npos) return out;
  int depth = 0;
  bool in_obj = false;
  bool got_obj_value = false;
  std::string num;
  auto flush = [&]() {
    if (!num.empty()) {
      out.push_back(std::stod(num));
      num.clear();
    }
  };
  for (size_t i = pos; i < json_body.size(); ++i) {
    char c = json_body[i];
    if (c == '[') {
      ++depth;
    } else if (c == ']') {
      if (!in_obj) flush();
      if (--depth == 0) break;
    } else if (c == '{') {
      in_obj = true;
      got_obj_value = false;
    } else if (c == '}') {
      in_obj = false;
    } else if (in_obj && c == ':') {
      // take only the FIRST value in each object
      size_t j = i + 1;
      while (j < json_body.size() &&
             (std::isspace(json_body[j]) != 0)) ++j;
      if (!got_obj_value) {
        std::string v;
        while (j < json_body.size() &&
               (std::isdigit(json_body[j]) || json_body[j] == '.' ||
                json_body[j] == '-' || json_body[j] == 'e' ||
                json_body[j] == 'E' || json_body[j] == '+')) {
          v += json_body[j++];
        }
        if (!v.empty()) {
          out.push_back(std::stod(v));
          got_obj_value = true;
        }
      }
      i = j - 1;
    } else if (!in_obj && depth == 1) {
      if (std::isdigit(c) || c == '.' || c == '-' || c == 'e' || c == 'E' ||
          c == '+') {
        num += c;
      } else if (c == ',') {
        flush();
      }
    }
  }
  return out;
}

std::vector<double> ServingClient::callPredict(
    const std::string& model_name,
    const std::vector<std::vector<long long>>& feat_ids,
    const std::vector<std::vector<double>>& feat_vals) {
  std::ostringstream body;
  body << "{\"inputs\":{\"feat_ids\":";
  AppendMatrix(body, feat_ids);
  body << ",\"feat_vals\":";
  AppendMatrix(body, feat_vals);
  body << "}}";
  std::string resp = httpRequest(
      "POST", "/v1/models/" + model_name + ":predict", body.str());
  if (resp.empty()) return {};
  return parsePredictions(resp);
}

std::vector<double> ServingClient::callPredictExample(
    const std::string& model_name,
    const std::vector<std::vector<double>>& cont_features,
    const std::vector<std::vector<long long>>& cat_features) {
  // The reference's parsing-signature wire format: per example one
  // serialized tf.Example with named features I1..I13 (float_list) and
  // C1..C26 (int64_list), shipped as a binary string tensor — here via
  // the TF-Serving REST b64 convention
  // (wide_n_deep_serving_client.cpp:45-62 parity).
  std::ostringstream body;
  body << "{\"instances\":[";
  for (size_t row = 0; row < cont_features.size(); ++row) {
    std::vector<std::pair<std::string, std::string>> feats;
    for (size_t i = 0; i < cont_features[row].size(); ++i) {
      feats.emplace_back("I" + std::to_string(i + 1),
                         FloatListFeature({cont_features[row][i]}));
    }
    const auto& cats = row < cat_features.size() ? cat_features[row]
                                                 : cat_features.back();
    for (size_t i = 0; i < cats.size(); ++i) {
      feats.emplace_back("C" + std::to_string(i + 1),
                         Int64ListFeature({cats[i]}));
    }
    if (row) body << ",";
    body << "{\"b64\":\"" << Base64(SerializeExample(feats)) << "\"}";
  }
  body << "]}";
  std::string resp = httpRequest(
      "POST", "/v1/models/" + model_name + ":predict", body.str());
  if (resp.empty()) return {};
  return parsePredictions(resp);
}

namespace {

// ---- tensorflow.serving Predict protos, hand-encoded (field numbers
// from tensor.proto / predict.proto / model.proto): the exact request
// the reference builds via protobuf (deep_fm_serving_client.cpp:42-62).
std::string TensorShape(const std::vector<long long>& dims) {
  std::string shape;
  for (long long d : dims) {
    std::string dim;
    dim.push_back(0x08);  // Dim.size = 1, varint
    PutVarint(&dim, static_cast<unsigned long long>(d));
    PutLenField(&shape, 2, dim);  // TensorShapeProto.dim = 2
  }
  return shape;
}

std::string Int64Tensor(const std::vector<std::vector<long long>>& m) {
  std::string t;
  t.push_back(0x08);  // dtype = 1, varint
  PutVarint(&t, 9);   // DT_INT64
  PutLenField(&t, 2, TensorShape({static_cast<long long>(m.size()),
                                  static_cast<long long>(m.empty() ? 0 : m[0].size())}));
  std::string packed;
  for (const auto& row : m)
    for (long long v : row) PutVarint(&packed, static_cast<unsigned long long>(v));
  PutLenField(&t, 10, packed);  // int64_val, packed
  return t;
}

std::string FloatTensor(const std::vector<std::vector<double>>& m) {
  std::string t;
  t.push_back(0x08);  // dtype = 1, varint
  PutVarint(&t, 1);   // DT_FLOAT
  PutLenField(&t, 2, TensorShape({static_cast<long long>(m.size()),
                                  static_cast<long long>(m.empty() ? 0 : m[0].size())}));
  std::string packed;
  for (const auto& row : m) {
    for (double d : row) {
      float f = static_cast<float>(d);
      char buf[4];
      std::memcpy(buf, &f, 4);  // little-endian hosts
      packed.append(buf, 4);
    }
  }
  PutLenField(&t, 5, packed);  // float_val, packed
  return t;
}

void PutInputEntry(std::string* req, const std::string& name,
                   const std::string& tensor) {
  std::string entry;
  PutLenField(&entry, 1, name);
  PutLenField(&entry, 2, tensor);
  PutLenField(req, 2, entry);  // PredictRequest.inputs = 2
}

// Minimal proto scanner for the response: find outputs-map entries
// (PredictResponse.outputs = 1) and pull packed float_val (field 5)
// out of the first float tensor.
unsigned long long ReadVarint(const std::string& buf, size_t* i) {
  unsigned long long v = 0;
  int shift = 0;
  while (*i < buf.size()) {
    unsigned char b = static_cast<unsigned char>(buf[(*i)++]);
    v |= static_cast<unsigned long long>(b & 0x7F) << shift;
    if (!(b & 0x80)) break;
    shift += 7;
  }
  return v;
}

bool FindFloatOutputs(const std::string& msg, std::vector<double>* out) {
  size_t i = 0;
  while (i < msg.size()) {
    unsigned long long key = ReadVarint(msg, &i);
    int field = static_cast<int>(key >> 3), wire = static_cast<int>(key & 7);
    if (wire == 2) {
      unsigned long long len = ReadVarint(msg, &i);
      if (i + len > msg.size()) return false;
      std::string payload = msg.substr(i, len);
      i += len;
      if (field == 1) {  // outputs map entry { 1: key, 2: TensorProto }
        size_t j = 0;
        while (j < payload.size()) {
          unsigned long long k2 = ReadVarint(payload, &j);
          int f2 = static_cast<int>(k2 >> 3), w2 = static_cast<int>(k2 & 7);
          if (w2 == 2) {
            unsigned long long l2 = ReadVarint(payload, &j);
            std::string inner = payload.substr(j, l2);
            j += l2;
            if (f2 == 2) {  // TensorProto
              size_t t = 0;
              while (t < inner.size()) {
                unsigned long long k3 = ReadVarint(inner, &t);
                int f3 = static_cast<int>(k3 >> 3),
                    w3 = static_cast<int>(k3 & 7);
                if (w3 == 2) {
                  unsigned long long l3 = ReadVarint(inner, &t);
                  if (f3 == 5 && l3 % 4 == 0) {  // packed float_val
                    for (size_t p = 0; p + 4 <= l3; p += 4) {
                      float f;
                      std::memcpy(&f, inner.data() + t + p, 4);
                      out->push_back(f);
                    }
                    if (!out->empty()) return true;
                  }
                  t += l3;
                } else if (w3 == 0) {
                  ReadVarint(inner, &t);
                } else if (w3 == 5) {
                  t += 4;
                } else if (w3 == 1) {
                  t += 8;
                } else {
                  return false;
                }
              }
            }
          } else if (w2 == 0) {
            ReadVarint(payload, &j);
          } else if (w2 == 5) {
            j += 4;
          } else if (w2 == 1) {
            j += 8;
          } else {
            return false;
          }
        }
      }
    } else if (wire == 0) {
      ReadVarint(msg, &i);
    } else if (wire == 5) {
      i += 4;
    } else if (wire == 1) {
      i += 8;
    } else {
      return false;
    }
  }
  return !out->empty();
}

}  // namespace

std::vector<double> ServingClient::callPredictGrpc(
    const std::string& model_name,
    const std::vector<std::vector<long long>>& feat_ids,
    const std::vector<std::vector<double>>& feat_vals) {
  // PredictRequest { 1: ModelSpec{1:name, 3:signature}, 2: inputs }
  std::string spec;
  PutLenField(&spec, 1, model_name);
  PutLenField(&spec, 3, std::string("serving_default"));
  std::string req;
  PutLenField(&req, 1, spec);
  PutInputEntry(&req, "feat_ids", Int64Tensor(feat_ids));
  PutInputEntry(&req, "feat_vals", FloatTensor(feat_vals));

  // grpc-web framing: flags byte 0 + 4-byte big-endian length + message
  std::string body;
  body.push_back('\x00');
  for (int s = 24; s >= 0; s -= 8)
    body.push_back(static_cast<char>((req.size() >> s) & 0xFF));
  body += req;

  std::string resp = httpRequest(
      "POST", "/tensorflow.serving.PredictionService/Predict", body,
      "application/grpc-web+proto");
  if (resp.empty()) return {};

  std::vector<double> out;
  size_t i = 0;
  while (i + 5 <= resp.size()) {
    unsigned char flags = static_cast<unsigned char>(resp[i]);
    unsigned long long len = 0;
    for (int b = 1; b <= 4; ++b)
      len = (len << 8) | static_cast<unsigned char>(resp[i + b]);
    if (i + 5 + len > resp.size()) break;
    std::string frame = resp.substr(i + 5, len);
    i += 5 + len;
    if (flags & 0x80) {  // trailers: check grpc-status
      if (frame.find("grpc-status: 0") == std::string::npos) {
        last_error_ = "grpc error: " + frame;
        return {};
      }
    } else if (!FindFloatOutputs(frame, &out)) {
      last_error_ = "no float outputs in PredictResponse";
      return {};
    }
  }
  return out;
}

std::string ServingClient::getModelStatus(const std::string& model_name) {
  return httpRequest("GET", "/v1/models/" + model_name, "");
}

}  // namespace tpu_ctr
