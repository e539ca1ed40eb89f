function connect(host, port)
% caffe.connect(host, port) — point this MATLAB session at a bridge
% daemon (python -m mms_answer_selection_tpu.cli matbridge --port P).
% Must be called once before any other caffe.* function.
if nargin < 1, host = '127.0.0.1'; end
if nargin < 2, port = 8491; end
caffe_('connect', char(host), double(port));
end
