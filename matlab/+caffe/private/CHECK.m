function CHECK(cond, msg)
if ~cond
  error('caffe:check', '%s', msg);
end
end
