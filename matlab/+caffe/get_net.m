function net = get_net(model_file, varargin)
% net = caffe.get_net(model_file, phase)
% net = caffe.get_net(model_file, weights_file, phase)
CHECK(ischar(model_file) || isstring(model_file), ...
      'model_file must be a string');
if numel(varargin) == 2      % (weights, phase)
  weights = varargin{1};
  phase = varargin{2};
elseif numel(varargin) == 1  % (phase)
  weights = '';
  phase = varargin{1};
else
  error('usage: get_net(model_file, [weights_file,] phase)');
end
h = caffe_('get_net', char(model_file), char(phase));
net = caffe.Net(h);
if ~isempty(weights)
  net.copy_from(char(weights));
end
end
